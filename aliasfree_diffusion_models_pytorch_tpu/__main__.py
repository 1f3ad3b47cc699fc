"""``python -m aliasfree_diffusion_models_pytorch_tpu`` → the CLI."""

import sys

from aliasfree_diffusion_models_pytorch_tpu.cli import main

sys.exit(main())
