"""`python -m ray_tracing_in_one_weekend_tpu` — render to stdout as PPM
(the reference's `./main > out.ppm` contract)."""

import sys

from ray_tracing_in_one_weekend_tpu.utils.cli import main

sys.exit(main())
