"""AOT-compile the flagship programs for a REAL multi-chip TPU topology.

The CPU-device test meshes (xla_force_host_platform_device_count) run the
Pallas kernels in interpret mode, which lowers to plain partitionable HLO —
so they can never catch the real-TPU failure mode "Mosaic kernels cannot be
automatically partitioned" (GSPMD + tpu_custom_call). This script compiles
ahead-of-time against a v5e:2x4 (8-chip) TopologyDescription — no hardware
needed beyond the TPU PJRT plugin — and verifies:

  1. the bf16 predict forward (all three Pallas kernel families active),
  2. the fused prompt-tuning train step,

both under the engines' (data, model) mesh, and reports the collectives GSPMD
inserted. Exits non-zero on any compile failure.

Usage: python scripts/check_multichip_compile.py [--topology v5e:2x4]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4")
    ap.add_argument("--data-axis", type=int, default=4)
    ap.add_argument("--model-axis", type=int, default=2)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from beach_seg_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    try:
        topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
    except Exception as e:  # no TPU plugin in this environment
        print(f"SKIP: cannot build topology {args.topology}: {e}")
        return 0

    devs = np.array(topo.devices).reshape(args.data_axis, args.model_axis)
    mesh = Mesh(devs, ("data", "model"))
    print(f"topology {args.topology} → mesh {mesh}")

    from beach_seg_tpu.models.seggpt.config import SegGPTConfig
    from beach_seg_tpu.models.seggpt.model import SegGPT

    cfg = SegGPTConfig()
    model = SegGPT(cfg, dtype=jnp.bfloat16)
    h, w = cfg.image_size[0] // 2, cfg.image_size[1]
    B = args.batch

    params_shape = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        *([jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)] * 3),
    )["params"]
    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    p_sh = jax.tree.map(lambda _: rep, params_shape)
    pa = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), params_shape)
    img = jax.ShapeDtypeStruct((B, h, w, 3), jnp.float32, sharding=bsh)

    def fwd(params, q, pi, pm):
        return model.apply({"params": params}, q, pi, pm, decode_query_only=True)["pred_masks"]

    rc = 0
    with jax.sharding.set_mesh(mesh):
        try:
            txt = (
                jax.jit(fwd, in_shardings=(p_sh, bsh, bsh, bsh))
                .lower(pa, img, img, img)
                .compile()
                .as_text()
            )
            colls = Counter(
                re.findall(r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)", txt)
            )
            print(
                f"forward: COMPILE OK | pallas custom-calls={txt.count('tpu_custom_call')} "
                f"| collectives={dict(colls)}"
            )
        except Exception as e:
            print(f"forward: COMPILE FAILED: {type(e).__name__}: {str(e)[:300]}")
            rc = 1

        try:
            import dataclasses

            from beach_seg_tpu.config import BeachSegConfig
            from beach_seg_tpu.train.prompt_tuner import PromptState, PromptTuner

            conf = dataclasses.replace(BeachSegConfig(), compute_dtype="bfloat16", batch_size=B)
            P_, S_ = 8, conf.inpt_size
            tuner = PromptTuner(model=model, conf=conf, num_prompts=P_, steps_per_epoch=4)
            pixels = jax.ShapeDtypeStruct((P_, S_, S_, 3), jnp.float32, sharding=rep)
            opt_shape = jax.eval_shape(tuner.optimizer().init, pixels)
            state = PromptState(
                prompt_pixels=pixels,
                ema_pixels=pixels,
                opt_state=jax.tree.map(
                    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), opt_shape
                ),
                step=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
            )
            batch = {
                "image": jax.ShapeDtypeStruct((B, S_, S_, 3), jnp.float32, sharding=bsh),
                "mask": jax.ShapeDtypeStruct((B, S_, S_), jnp.int32, sharding=bsh),
                "nodata": jax.ShapeDtypeStruct((B, S_, S_), jnp.bool_, sharding=bsh),
            }
            pm_ = jax.ShapeDtypeStruct((P_, S_, S_), jnp.int32, sharding=rep)
            pn_ = jax.ShapeDtypeStruct((P_, S_, S_), jnp.bool_, sharding=rep)
            key = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
            txt = (
                tuner.train_step.lower(tuner, state, pa, pm_, pn_, batch, key)
                .compile()
                .as_text()
            )
            colls = Counter(
                re.findall(r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)", txt)
            )
            print(
                f"train_step: COMPILE OK | pallas custom-calls={txt.count('tpu_custom_call')} "
                f"| collectives={dict(colls)}"
            )
        except Exception as e:
            print(f"train_step: COMPILE FAILED: {type(e).__name__}: {str(e)[:300]}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
