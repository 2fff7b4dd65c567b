"""Recipe 6: multi-chip training + inference over a device mesh.

Everything the reference left as a TODO or ran serially, as one recipe:

  * data-parallel TRAINING (``EM2EM.to_mesh`` — the MirroredStrategy TODO,
    reference cgan.py:8-11 / README.md:93-94, with global-batch losses)
  * data-parallel TILED INFERENCE (``predict_volume(mesh=)`` — the
    reference's serial tile loop, utils.py:107-126, as one sharded program)
  * spatially-sharded HALO INFERENCE (``parallel.halo_predict`` — one huge
    block split across devices, VALID-conv halos exchanged over ICI with
    ppermute), including 2-D z x y decomposition on a (space, space_y) mesh

No TPU pod needed to try it — simulate 8 devices on CPU:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/multichip_inference.py

On real hardware it uses every visible chip as-is.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some environments pin jax_platforms via sitecustomize, overriding the
# env var; re-assert it so the simulated-device run line above works —
# and warn rather than silently degrade to whatever backend is active.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    _want = os.environ["JAX_PLATFORMS"]
    try:
        if jax.config.jax_platforms != _want:
            jax.config.update("jax_platforms", _want)
    except Exception as e:
        print(f"WARNING: could not honor JAX_PLATFORMS={_want} ({e}); "
              f"running on the active backend instead", file=sys.stderr)

import jax
import jax.numpy as jnp
import numpy as np

from transfer_em_tpu.infer import predict_volume
from transfer_em_tpu.ops.convs import zero_pad
from transfer_em_tpu.parallel import halo_predict, make_mesh
from transfer_em_tpu.shapes import generator_shapes
from transfer_em_tpu.train import EM2EM


def main(wf=32, steps=2, exp_name="multichip_demo"):
    n = jax.device_count()
    print(f"{n} device(s): {jax.devices()[0].platform}")

    # --- 1. Data-parallel training: one call after construction ---------
    model = EM2EM(74, exp_name, is3d=False, wf=wf)
    model.to_mesh(make_mesh(n))  # batch sharded, params replicated,
    rng = np.random.default_rng(0)  # gradient psum inserted by XLA
    x = rng.normal(size=(n, 74, 74, 1)).astype(np.float32)
    y = rng.normal(size=(n, 74, 74, 1)).astype(np.float32)
    for _ in range(steps):
        losses = model.train_step(x, y)
    print(f"DP train step on {n} devices, losses: {np.asarray(losses)[:3]}")

    # --- 2. Data-parallel tiled inference (volume replicated, tile -----
    # batches sharded over 'data'; bit-identical to single-device) -------
    from transfer_em_tpu.models import UNetGenerator

    gen = UNetGenerator(wf=wf)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 74, 74, 74, 1), jnp.float32))
    vol = rng.integers(0, 255, size=(100, 100, 100), dtype=np.uint8)
    args = (vol, gen.apply, params, (20, 20, 20), (36, 36, 36),
            (0.0, 1.0), (0.0, 1.0))
    single = predict_volume(*args, mode="device", batch_size=2)
    sharded = predict_volume(*args, mode="device", batch_size=2,
                             mesh=make_mesh(n))
    np.testing.assert_array_equal(sharded, single)
    print(f"DP tiled inference == single-device: {sharded.shape} uint8")

    # --- 3. Spatially-sharded halo inference: one block across all ------
    # devices, halos over ICI (slab%4==0, slab+2*buffer a valid dimsize) --
    buffer = generator_shapes(74).buffer  # 17
    slab = 20
    big = jnp.asarray(rng.normal(size=(n * slab, 74, 74, 1)), jnp.float32)
    smesh = make_mesh(n, data=1, space=n)
    out = halo_predict(gen.apply, params, big, smesh, buffer)
    want = gen.apply(params, zero_pad(big[None], buffer)
                     [:, :, buffer:-buffer, buffer:-buffer])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    print(f"halo-sharded {big.shape} -> {out.shape} == unsharded generator")

    # --- 4. 2-D spatial decomposition: z x y device grid ----------------
    if n % 4 == 0:
        m2 = make_mesh(n, data=n // 4, space=2, space_y=2)
        sq = jnp.asarray(rng.normal(size=(2 * slab, 2 * slab, 74, 1)),
                         jnp.float32)
        out2 = halo_predict(gen.apply, params, sq, m2, buffer,
                            y_axis="space_y")
        want2 = gen.apply(params, zero_pad(sq[None], buffer)
                          [:, :, :, buffer:-buffer])[0]
        np.testing.assert_allclose(np.asarray(out2), np.asarray(want2),
                                   rtol=1e-4, atol=1e-5)
        print(f"z x y halo grid {sq.shape} -> {out2.shape} == unsharded")
    return np.asarray(losses)


if __name__ == "__main__":
    main()
