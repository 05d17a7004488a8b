#!/usr/bin/env python
"""Reference-named alias for scripts/zero_ret_TVTSv2.py (arch TVTSv2_B_32).

The reference ships one near-identical file per tower
(v2/downstream/zero_ret_TVTSv2_ViT_B_32.py); here each alias pins the arch and
delegates to the parameterized driver.
"""

import sys

sys.argv[0] = "scripts/zero_ret_TVTSv2.py"

from zero_ret_TVTSv2 import main

if __name__ == "__main__":
    main()
