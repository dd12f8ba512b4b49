from rendering_tpu.cli import main

raise SystemExit(main())
