"""spark-submit entrypoint (the north rule's deployment shape:
``spark-submit --py-files crba_etl_spark.zip run_cdc.py <cmd> ...``).

The package arrives via --py-files; this driver file only dispatches to
the CLI. Smoke-tested for real in tests/test_spark_submit.py — the
subprocess runs from a neutral cwd so the import provably comes from
the shipped zip, not the repo checkout.
"""

import sys

from crba_etl_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
