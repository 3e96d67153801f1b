from stormtpu.cli import main

raise SystemExit(main())
