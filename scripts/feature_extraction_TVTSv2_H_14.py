#!/usr/bin/env python
"""Reference-named alias for scripts/feature_extraction_TVTSv2.py (arch TVTSv2_H_14).

The reference ships one near-identical file per tower
(v2/downstream/feature_extraction_TVTSv2_H_14.py); here each alias pins the arch and
delegates to the parameterized driver.
"""

import sys

sys.argv[0] = "scripts/feature_extraction_TVTSv2.py"
sys.argv.insert(1, "--arch"); sys.argv.insert(2, "TVTSv2_H_14")

from feature_extraction_TVTSv2 import main

if __name__ == "__main__":
    main()
