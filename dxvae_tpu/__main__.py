"""``python -m dxvae_tpu`` — shorthand for ``python -m dxvae_tpu.cli``."""

import sys

from dxvae_tpu.cli import main

sys.exit(main())
