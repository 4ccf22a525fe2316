import sys

from cds_etl_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
