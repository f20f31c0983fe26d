"""spark-submit driver stub: the same CLI as ``python -m log2seq_spark``,
launched with the package shipped via --py-files (no install on nodes):

    spark-submit --master <cluster> --py-files dist/log2seq_spark.zip \
        tools/submit.py pipeline --input <turns> --out <dir>
"""

import sys

from log2seq_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
