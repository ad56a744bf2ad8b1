"""`python -m inputlayer_spark` — launch the IQL shell (repl.py)."""

from inputlayer_spark.repl import main

raise SystemExit(main())
