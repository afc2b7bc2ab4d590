"""NIST StRD benchmark — analog of examples/nist.cc.

Prints the per-problem LRE table and the summary score (Ceres reference:
average LRE 9.4, 41/54 wins — nist.cc:67-72).
"""

import argparse

import ceres_tpu as ct
from ceres_tpu.models import nist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--nist_data_dir", default="/root/reference/data/nist"
    )
    ap.add_argument("--names", nargs="*", default=None)
    ap.add_argument("--num_iterations", type=int, default=10000)
    args = ap.parse_args()

    options = nist.default_options()
    options.max_num_iterations = args.num_iterations
    results = nist.run_suite(
        data_dir=args.nist_data_dir,
        options=options,
        names=args.names,
        verbose=True,
    )
    if not results:
        print("no problems matched")


if __name__ == "__main__":
    main()
