#!/usr/bin/env python
"""Reference-named alias for scripts/train_dist_TVTSv2.py (arch TVTSv2_H_14).

The reference ships one near-identical file per tower
(v2//train_dist_TVTSv2_ViT_H_14.py); here each alias pins the arch and
delegates to the parameterized driver.
"""

import sys

sys.argv[0] = "scripts/train_dist_TVTSv2.py"

from train_dist_TVTSv2 import main

if __name__ == "__main__":
    main()
