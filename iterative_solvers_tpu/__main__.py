from iterative_solvers_tpu.cli import main

raise SystemExit(main())
