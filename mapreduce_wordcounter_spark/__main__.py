"""``python -m mapreduce_wordcounter_spark file1 file2 …``"""

import sys

from mapreduce_wordcounter_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
