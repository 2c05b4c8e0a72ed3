"""Repository-relative paths shared by figure evaluation scripts.

Thin re-export of :mod:`ghm_tpu.eval.paths` so the figure scripts keep the
reference's import surface (``from eval_paths import checkpoint_dir, ...``).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from ghm_tpu.eval.paths import (  # noqa: F401,E402
    CHECKPOINT_ROOT,
    GHM_DATA_DIR,
    REPO_ROOT,
    checkpoint_dir,
    ghm_output_path,
    latest_checkpoint,
)
