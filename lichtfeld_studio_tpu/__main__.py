from lichtfeld_studio_tpu.cli import main

raise SystemExit(main())
