from shaha_spark.cli import main

raise SystemExit(main())
