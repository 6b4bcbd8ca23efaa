"""One arm of the scaling benchmark, run as a subprocess (optionally under
``taskset``) so local[N] really means N CPUs — otherwise the JVM, shuffle
threads and Python workers of the 'small' arm silently borrow idle cores
and the measured efficiency undershoots real cluster scaling.

Usage: python tools/scale_arm.py <cores> <n_docs>   → one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    from bench import scaling_run

    rep = scaling_run(cores, n_docs)
    print("SCALE_ARM_RESULT " + json.dumps(rep))


if __name__ == "__main__":
    main()
