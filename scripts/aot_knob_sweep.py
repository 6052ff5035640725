"""AOT-compile ONE attention layer for every supported kernel-knob combo.

Why this exists (VERDICT r04 weak #1/#6): the interpret-mode CPU tests pin
the VALUES of every knob combination but can never catch Mosaic LOWERING
failures — round 4's `ksplit×joint_rel` combo passed every test and then
failed real-TPU compile with "batch dims must be equal" the first time the
measurement queue reached it. This sweep compiles each combination
ahead-of-time against a v5e:1x1 TopologyDescription (no hardware execution;
only the compile service is needed) at a deliberately tiny grid (B=1, one
head pair) — Mosaic lowers the SAME per-block kernel body regardless of
grid size, so a 1-head compile proves lowerability for the flagship 16-head
geometry at a fraction of the compile cost.

Policy mirrors scripts/check_multichip_compile.py: environment-level
conditions (no TPU plugin, compile service down/slow) print SKIP and exit 0;
genuine Mosaic/lowering errors print FAILED and exit 1. Wired into
scripts/run_measurement_queue.sh so every queue pass re-certifies the matrix.

KNOWN LIMIT (measured 2026-08-20): this environment's AOT chipless compile
helper and its live-chip execution compile path do not share Mosaic layout
behavior — joint_rel's q-halves concatenate compiled OK through AOT at the
exact flagship geometry while the execution path rejected it
("result/input offset mismatch on non-concat dimension"). The sweep
certifies AOT lowerability; an execution-path compile (any bench/e2e run)
remains the final word, which is one of the reasons the measurement queue
runs both. joint_rel/ksplit were retired over this.

Usage: python scripts/aot_knob_sweep.py [--topology v5e:2x2] [--geometry vitl]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.check_multichip_compile import classify  # noqa: E402


# Each row: (label, kwargs for _pallas_attention_qkv_rel) — the surviving
# knob matrix after the round-5 prune (softmax stability mode × q-block
# size; the six retired schedule variants' rows are gone with their code).
# Duplicate resolved configs are deduped at runtime.
COMBOS: list[tuple[str, dict]] = [
    ("default (stable)", dict(softmax="stable")),
    ("clamp", dict(softmax="clamp")),
    ("fast", dict(softmax="fast")),
    ("bq=S (one q-block)", dict(softmax="clamp", block_q=None)),  # None → S
    ("bq=392", dict(softmax="clamp", block_q=392)),
    ("bq=S stable", dict(softmax="stable", block_q=None)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x2")
    ap.add_argument("--geometry", default="vitl", choices=["vitl", "huge"])
    args = ap.parse_args()

    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    init_deadline = float(os.environ.get("BEACH_SEG_TPU_AOT_INIT_DEADLINE", "300"))

    def _init_watchdog():
        print(
            f"SKIP: cannot build topology {args.topology}: init exceeded "
            f"{init_deadline:.0f}s (compile service down or hung)",
            flush=True,
        )
        os._exit(0)

    watchdog = threading.Timer(init_deadline, _init_watchdog)
    watchdog.daemon = True
    watchdog.start()
    try:
        import numpy as np
        from jax.experimental import topologies
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
        mesh = Mesh(np.array(topo.devices[:1]), ("data",))
        rep = NamedSharding(mesh, P())
    except Exception as e:
        print(f"SKIP: cannot build topology {args.topology}: {type(e).__name__}: {str(e)[:300]}")
        return 0
    finally:
        watchdog.cancel()
    print(f"topology {args.topology} → 1-device mesh")

    from beach_seg_tpu.ops.pallas_attn import _pallas_attention_qkv_rel

    # ViT-L crop geometry: gh=56, gw=28 → S=1568, FULL 16 heads. The head
    # count must match the flagship: a 1-head-pair sweep compiled a
    # joint-rel combo that then failed Mosaic at nh=16 ("result/input offset
    # mismatch" on a concatenate — layout assignment differs with the grid),
    # so shrinking the grid trades away exactly the failures this sweep
    # exists to catch. b=2 keeps the batch axis > 1 for the same reason.
    gh, gw, hd = 56, 28, 64
    s = gh * gw
    nh = 16
    b = 2
    c = nh * hd
    dt = jnp.bfloat16

    qkv = jax.ShapeDtypeStruct((b, s, 3 * c), dt, sharding=rep)
    rh_tab = jax.ShapeDtypeStruct((gh, 64, hd), dt, sharding=rep)
    rw_tab = jax.ShapeDtypeStruct((gw, 64, hd), dt, sharding=rep)

    run_deadline = float(os.environ.get("BEACH_SEG_TPU_AOT_RUN_DEADLINE", "900"))
    done = [0]
    rc_holder = [0]

    def _run_watchdog():
        if rc_holder[0]:
            print(
                f"DEADLINE after a COMPILE FAILED — {done[0]}/{len(COMBOS)} "
                "combos compiled; exiting with the failure",
                flush=True,
            )
            os._exit(rc_holder[0])
        print(
            f"SKIP: compile service unresponsive/slow — {done[0]}/{len(COMBOS)} "
            f"combos compiled before the {run_deadline:.0f}s deadline",
            flush=True,
        )
        os._exit(0)

    run_watchdog = threading.Timer(run_deadline, _run_watchdog)
    run_watchdog.daemon = True
    run_watchdog.start()

    rc = 0
    seen: set[tuple] = set()
    for label, kw in COMBOS:
        kw = dict(kw)
        if kw.get("block_q", 784) is None:
            kw["block_q"] = s
        key = tuple(sorted(kw.items()))
        if key in seen:
            print(f"{label:28s} DUP (resolved config already compiled)")
            continue
        seen.add(key)

        def fn(qkv, rh, rw, kw=kw):
            return _pallas_attention_qkv_rel(qkv, rh, rw, hd**-0.5, nh, **kw)

        try:
            t0 = time.perf_counter()
            with jax.sharding.set_mesh(mesh):
                jax.jit(fn).lower(qkv, rh_tab, rw_tab).compile()
            print(f"{label:28s} COMPILE OK   ({time.perf_counter() - t0:5.1f}s)", flush=True)
            done[0] += 1
        except Exception as e:
            kind = classify(e)
            if kind == "infra":
                print(f"{label:28s} SKIP (environment): {type(e).__name__}: {str(e)[:200]}")
            else:
                print(f"{label:28s} COMPILE FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
                rc = rc_holder[0] = 1
    run_watchdog.cancel()
    print(f"knob sweep: {done[0]} OK / {len(COMBOS)} combos, rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
