"""``python -m nacc_form_validator_ray`` → the CLI (also the entry point
for ``ray job submit -- python -m nacc_form_validator_ray quality-filter
-i s3://pages -o s3://filtered`` on a real cluster)."""

import sys

from nacc_form_validator_ray.cli import main

if __name__ == "__main__":
    sys.exit(main())
