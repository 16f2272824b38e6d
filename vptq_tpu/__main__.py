from vptq_tpu.serving.cli import main

raise SystemExit(main())
