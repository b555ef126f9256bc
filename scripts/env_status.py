#!/usr/bin/env python
"""Regenerate the environment-blocked-leg status artifacts.

Two legs of the reference's benchmark surface cannot execute in this image;
each gets a per-round JSON artifact recording exactly why, so every
unexecuted reference leg is explicitly accounted for rather than silently
absent:

* SLEPc comparison (reference ``scripts/utils.py:352-381``): petsc4py /
  slepc4py are uninstallable (no egress, no mpicc).  The faithful port
  (``harness/slepc.py``, ``harness/compare_slepc.py``) has only ever
  executed its ImportError path here.
* SuiteSparse corpus (reference ``scripts/download_matrices.sh`` /
  ``benchmark-partial-schur.py:28-50``): the fetcher is ported
  (``scripts/download_matrices.sh``) but zero egress means every published
  number uses the synthetic generators instead.

Usage: ``python scripts/env_status.py [round_tag]`` (default r05) — writes
``artifacts/slepc_status_{tag}.json`` and
``artifacts/suitesparse_status_{tag}.json``.
"""

import json
import os
import platform
import shutil
import socket
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ARTIFACTS = os.path.join(HERE, "..", "artifacts")

#: The reference's 8-matrix corpus (download_matrices.sh), by tier.
CORPUS = {
    "easy": ["HB/1138_bus", "Bai/mhd1280b", "Bai/rdb1250"],
    "medium": ["HB/bcsstk16", "HB/bcsstk18", "Nasa/nasasrb"],
    "hard": ["Bai/af23560", "Bai/olm5000"],
}

#: Synthetic stand-ins used by CI and the published benchmarks instead.
STAND_INS = [
    "mark:N (golden-tested vs the reference's generator)",
    "laplace / laplace2d / laplace3d (analytic spectra)",
    "grcar:N, clement:N (reference compare-against-arpack.py matrices)",
    "random_scattered (banded/blocked FE-profile SuiteSparse stand-in)",
    "random_scattered_complex_pairs (dominant conjugate pairs)",
]


def probe_egress(host="suitesparse-collection-website.herokuapp.com",
                 timeout=5):
    """True if a TCP connection to the corpus host can be opened."""
    try:
        with socket.create_connection((host, 443), timeout=timeout):
            return True, None
    except OSError as e:
        return False, f"{type(e).__name__}: {e}"


def slepc_status():
    status = {"leg": "slepc", "python": platform.python_version()}
    try:
        import petsc4py  # noqa: F401
        import slepc4py  # noqa: F401

        status["status"] = "available"
    except ImportError as e:
        status["status"] = "blocked"
        status["reason"] = str(e)
    egress, err = probe_egress("pypi.org")
    status["network"] = egress
    status["mpicc"] = shutil.which("mpicc")
    status["note"] = (
        "petsc4py/slepc4py absent; no network egress and no MPI compiler "
        "wrapper in the image, so the source build in docs/INSTALL_SLEPC.md "
        "cannot run here. The port (harness/slepc.py, "
        "harness/compare_slepc.py) is UNEXERCISED in this environment; "
        "only its ImportError path is tested.")
    return status


def suitesparse_status():
    egress, err = probe_egress()
    matrices = [m for tier in CORPUS.values() for m in tier]
    have = [m for m in matrices
            if os.path.exists(os.path.join("matrices",
                                           os.path.basename(m) + ".mat"))]
    status = {
        "leg": "suitesparse-corpus",
        "status": "available" if (egress or len(have) == len(matrices))
                  else "blocked",
        "network": egress,
        "probe_error": err,
        "corpus": CORPUS,
        "downloaded": have,
        "fetcher": "scripts/download_matrices.sh (ported; same 8 matrices "
                   "and tiers as the reference's)",
        "loaders_tested": "load_suitesparse_mat/load_matrix_market run in "
                          "CI on synthetic .mat/.mtx files "
                          "(tests/test_matrices.py)",
        "stand_ins": STAND_INS,
        "note": "Zero-egress image: the corpus cannot be fetched, so every "
                "published benchmark number uses the synthetic generators "
                "above. If the corpus is present on disk (matrices/*.mat), "
                "harness CLIs accept the .mat paths directly and the "
                "stress/benchmark sweeps run on them unchanged.",
    }
    return status


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    os.makedirs(ARTIFACTS, exist_ok=True)
    for status in (slepc_status(), suitesparse_status()):
        name = status["leg"].split("-")[0]
        path = os.path.join(ARTIFACTS, f"{name}_status_{tag}.json")
        with open(path, "w") as f:
            json.dump(status, f, indent=2)
        print(f"{path}: {status['status']}")


if __name__ == "__main__":
    main()
