"""`python -m transporter_spark` — the `transporter` CLI analog."""

from transporter_spark.cli import main

raise SystemExit(main())
