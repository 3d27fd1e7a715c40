"""A/B: flip-test eval as one 2B-batch forward vs two B-batch forwards.

W32 COCO 256x192 eval step (flip + shift + decode), b=128, differenced
chained timing (preds fed back through a zero-scaled carry).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B = 128
IMG_H, IMG_W = 256, 192
J = 17
N1, N2 = 10, 40


def main():
    from fhpe_tpu.config import load_config
    from fhpe_tpu.geometry.flip import (flip_back_jax,
                                        flip_pair_permutation)
    from fhpe_tpu.data import dataset_meta
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.ops.decode import decode_heatmaps_jax

    cfg = load_config(
        "/root/repo/experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml")
    model = get_pose_net(cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, IMG_H, IMG_W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    perm = jnp.asarray(flip_pair_permutation(
        J, dataset_meta("coco")["flip_pairs"]))
    inv = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, 1, 1))

    def post(output):
        flipped_half = output[B:] if output.shape[0] == 2 * B else None
        return output

    def make(two_fwd):
        def step(xx):
            if two_fwd:
                out = model.apply(variables, xx, train=False)
                fl = model.apply(variables, xx[:, :, ::-1, :], train=False)
            else:
                both = jnp.concatenate([xx, xx[:, :, ::-1, :]], axis=0)
                ob = model.apply(variables, both, train=False)
                out, fl = jnp.split(ob, 2, axis=0)
            fl = flip_back_jax(fl, perm)
            fl = jnp.concatenate([fl[:, :, :1, :], fl[:, :, :-1, :]], axis=2)
            out = (out + fl) * 0.5
            preds, maxvals = decode_heatmaps_jax(out, inv, True)
            return preds, maxvals

        @jax.jit
        def chain(n, xx):
            def body(i, v):
                preds, _ = step(v)
                s = jnp.sum(preds) * 1e-20
                return v + s.astype(v.dtype)
            return jax.lax.fori_loop(0, n, body, xx)

        return chain

    for name, two in [("two B fwds", True), ("one 2B fwd", False)]:
        f = make(two)
        jax.block_until_ready(f(N1, x))

        def t(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jnp.sum(f(n, x)).item()
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (t(N2) - t(N1)) / (N2 - N1)
        print(f"{name}: {dt*1e3:7.2f} ms/step  {B/dt:7.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
