"""python -m crawler_core_spark — see cli.py (CommonMain.java analogue)."""
import sys

from crawler_core_spark.cli import main

sys.exit(main())
