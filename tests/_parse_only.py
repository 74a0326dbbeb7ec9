"""Parse-only CLI harness used by test_cli_smoke.py.

Invoked as ``python tests/_parse_only.py tools/X.py --flag ...``: loads the
tool as a module (``__name__ != "__main__"`` so its main() never runs) and
calls its ``parse_args()`` with the given argv. Exits nonzero on any flag the
tool does not define — catching the drift class that broke the reference-era
``scripts/inference_multidevice.sh`` (flags passed that argparse rejects).
"""

import importlib.util
import os
import sys

target = os.path.abspath(sys.argv[1])
sys.argv = [target] + sys.argv[2:]
spec = importlib.util.spec_from_file_location("_cli_under_test", target)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
if not hasattr(mod, "parse_args"):
    sys.exit(f"{target} has no parse_args()")
mod.parse_args()  # SystemExit(2) on unknown/invalid flags
print(f"PARSE_OK {os.path.basename(target)}")
