"""Run the curated real-TPU test suite and record the result.

The analog of the reference's CUDA-vs-CPU equivalence suite
(cuda_vector_test.cc etc.) executed on the actual accelerator:

    python run_tpu_tests.py [--out TPUTESTS_rNN.json]

Sets CERES_TPU_TESTS=1 (tests/conftest.py leaves the real platform
active and runs only the ``tpu``-marked subset) and writes a JSON
artifact {collected, passed, failed, skipped, duration_s} for the
driver/judge.
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent


def main():
    out = "TPUTESTS_r04.json"
    args = sys.argv[1:]
    if "--out" in args:
        out = args[args.index("--out") + 1]
    env = dict(__import__("os").environ)
    env["CERES_TPU_TESTS"] = "1"
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", "tests/", "-m", "tpu",
            "-q", "-p", "no:cacheprovider",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
    )
    duration = time.time() - t0
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    summary_line = ""
    for line in reversed(proc.stdout.splitlines()):
        if re.search(r"\d+ (passed|failed|error)", line):
            summary_line = line.strip()
            break

    def count(word):
        m = re.search(rf"(\d+) {word}", summary_line)
        return int(m.group(1)) if m else 0

    result = {
        "suite": "CERES_TPU_TESTS=1 pytest tests/ -m tpu",
        "backend": "axon (1 real TPU v5e chip)",
        "passed": count("passed"),
        "failed": count("failed") + count("error"),
        "skipped": count("skipped") + count("deselected"),
        "duration_s": round(duration, 1),
        "returncode": proc.returncode,
        "summary": summary_line,
    }
    (REPO / out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    if proc.returncode != 0:
        print(tail[-3000:], file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
