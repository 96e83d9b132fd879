"""``python -m furchild_spark`` — see furchild_spark.cli."""

import signal
import sys

from furchild_spark.cli import main

# piping into `head` must not traceback: restore the default SIGPIPE
# disposition so a closed pipe terminates the process quietly
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

sys.exit(main())
