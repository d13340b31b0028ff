from x264_tpu.cli import main

raise SystemExit(main())
