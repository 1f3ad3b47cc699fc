"""Test-only loader for the read-only reference implementation.

The reference package (``/root/reference/modules``) imports torchvision at
module scope but the models themselves never use it, so we stub just enough
for the import to succeed. Tests using this oracle are skipped when the
reference checkout or torch is unavailable (e.g. for end users of this repo).
"""

import os
import sys
import types

REFERENCE_PATH = os.environ.get("AFDM_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "modules"))


def load_reference_modules():
    """Import and return the reference ``modules.ddpm_models`` module."""
    for name in [
        "torchvision",
        "torchvision.transforms",
        "torchvision.utils",
        "torchvision.datasets",
    ]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    tv = sys.modules["torchvision"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.utils = sys.modules["torchvision.utils"]
    tv.datasets = sys.modules["torchvision.datasets"]
    for attr in ["ToPILImage", "Compose", "Resize", "Normalize", "ToTensor"]:
        setattr(tv.transforms, attr, object)

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import modules.ddpm_models as ref_models  # noqa: PLC0415

    return ref_models
