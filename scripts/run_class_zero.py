#!/usr/bin/env python
"""Reference-named alias for scripts/run_class_finetuning.py (arch TVTS).

The reference ships one near-identical file per tower
(v2/v1/downstream/run_class_zero.py); here each alias pins the arch and
delegates to the parameterized driver.
"""

import sys

sys.argv[0] = "scripts/run_class_finetuning.py"
sys.argv.insert(1, "--mode"); sys.argv.insert(2, "zero")

from run_class_finetuning import main

if __name__ == "__main__":
    main()
