from egal_yet_another_earthquake_project_spark.jobs import main

raise SystemExit(main())
