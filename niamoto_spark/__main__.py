from niamoto_spark.cli import main

raise SystemExit(main())
