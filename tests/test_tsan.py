"""ThreadSanitizer check of the threaded native kernels.

SURVEY.md §5 race-detection row: the reference relies on Rust's compile-time
guarantees for its rayon sites; our threaded hot path is the C++ worker pool
in native/stripe.cpp, so we check it dynamically with -fsanitize=thread
(dev/tsan.sh drives a 16-thread batch over 64 jobs plus chain extraction).
"""
import os
import subprocess

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_native_thread_pool_is_race_free():
    probe = subprocess.run(
        ["g++", "-fsanitize=thread", "-x", "c++", "-", "-o", "/dev/null"],
        input=b"int main(){return 0;}", capture_output=True,
    )
    if probe.returncode != 0:
        pytest.skip("toolchain lacks -fsanitize=thread")
    r = subprocess.run(
        ["bash", os.path.join(HERE, "dev", "tsan.sh")],
        capture_output=True, text=True, timeout=280,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "no data races reported" in r.stdout
