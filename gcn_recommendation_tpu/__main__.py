import sys

from gcn_recommendation_tpu.cli import main

sys.exit(main())
