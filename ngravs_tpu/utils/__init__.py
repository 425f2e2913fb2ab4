"""Small host-side utilities shared by the drivers."""

import atexit
import shutil
import tempfile


def scratch_output_dir() -> str:
    """A process-lifetime scratch directory for run artifacts when no
    OutputDir was configured (never litter the CWD; begrun.c requires
    OutputDir, we degrade gracefully instead).  Cleaned up at interpreter
    exit — callers who want persistent artifacts must set OutputDir or
    pass an explicit log_dir/path."""
    d = tempfile.mkdtemp(prefix="ngravs_out_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d
