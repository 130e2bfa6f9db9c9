"""Driver entry: the headline benchmark JSON line.

The implementation lives in :mod:`nbody_tpu.bench.headline`; this shim is
the file the benchmark driver invokes (``python bench.py`` from the repo
root, where ``nbody_tpu`` is importable from the working directory or an
installed package).
"""

from nbody_tpu.bench.headline import main

if __name__ == "__main__":
    main()
