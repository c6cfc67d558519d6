"""Build the AOT tile-program artifacts for the production shape
classes so no polish run ever XLA-compiles in-process.

Run once per machine / jax upgrade / poa-source change:

    python tools/prewarm_aot.py          # default SR scores (5,-4,-8)

Artifacts land in ~/.cache/hypo_tpu_aot (override: HYPO_AOT_DIR).
"""
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hypo_tpu.poa import aot
from hypo_tpu.poa.full_runner import CLASSES, P_FULL


def main(scores=(5, -4, -8)) -> None:
    m, n, g = scores
    for ci, (L, N, K, B, A) in enumerate(CLASSES):
        params = dict(N=N, L=L, K=K, P=P_FULL, m=m, n=n, g=g, B=B, A=A,
                      dp_impl="pallas", ndev=1)
        t0 = time.time()
        if aot.load_tile_program(params) is not None:
            print(f"[prewarm] class {ci}: artifact present "
                  f"({time.time()-t0:.1f}s load)")
        else:
            aot.compile_and_save(params)
            print(f"[prewarm] class {ci}: compiled+saved "
                  f"in {time.time()-t0:.1f}s")
        t0 = time.time()
        if aot.get_concat_program(B, N // 2 + 4, 64,
                                  allow_compile=False) is None:
            aot.get_concat_program(B, N // 2 + 4, 64)
            print(f"[prewarm] class {ci} concat: compiled+saved "
                  f"in {time.time()-t0:.1f}s")
        else:
            print(f"[prewarm] class {ci} concat: artifact present")


def ship() -> None:
    """Copy the current artifacts into the repo's aux/aot so a fresh
    machine with the same (jax, device kind, poa sources) never
    compiles.  Run after the last poa-source change of a round."""
    import shutil

    from hypo_tpu.poa.full_runner import CLASSES as CL
    dst = aot._repo_artifact_dir()
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(dst):
        os.remove(os.path.join(dst, f))
    n = 0
    for ci, (L, N, K, B, A) in enumerate(CL):
        params = dict(N=N, L=L, K=K, P=P_FULL, m=5, n=-4, g=-8, B=B,
                      A=A, dp_impl="pallas", ndev=1)
        for src in (aot._artifact_path(params),
                    aot._concat_artifact_path(B, N // 2 + 4, 64)):
            if os.path.exists(src):
                shutil.copy(src, dst)
                n += 1
    print(f"[prewarm] shipped {n} artifact(s) to {dst}")


if __name__ == "__main__":
    if "--ship" in sys.argv:
        main()
        ship()
    else:
        sc = tuple(int(x) for x in sys.argv[1:4]) if len(sys.argv) > 3 \
            else (5, -4, -8)
        main(sc)
