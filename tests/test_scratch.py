"""The scratch-dir contract: directories are handed out immediately and
removed at interpreter exit (the leak fix for per-query /tmp fixtures).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile


def test_scratch_dir_exists_during_process_and_is_removed_at_exit():
    code = (
        "import os\n"
        "from kinesis_sample_spark.scratch import scratch_dir\n"
        "d = scratch_dir('kss_testprobe_')\n"
        "assert os.path.isdir(d)\n"
        "open(os.path.join(d, 'f.txt'), 'w').write('x')\n"
        "print(d)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
    )
    assert r.returncode == 0, r.stderr
    d = r.stdout.strip().splitlines()[-1]
    # mkdtemp honors TMPDIR — anchor on the platform temp dir, not /tmp
    expected_prefix = os.path.join(tempfile.gettempdir(), "kss_testprobe_")
    assert d.startswith(expected_prefix)
    assert not os.path.exists(d), "scratch dir survived interpreter exit"


def test_scratch_cleanup_tolerates_already_removed_dir():
    code = (
        "import shutil\n"
        "from kinesis_sample_spark.scratch import scratch_dir\n"
        "d = scratch_dir('kss_testprobe_')\n"
        "shutil.rmtree(d)\n"  # eager cleanup (the q185/q186 pattern)
        "print('ok')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
    )
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout
