from ntto_ray.cli import main

raise SystemExit(main())
