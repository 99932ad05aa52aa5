from anyedit_tpu.cli import main

raise SystemExit(main())
