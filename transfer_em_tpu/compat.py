"""Interop with reference TF/Keras assets (janelia-flyem/transfer_em).

A user migrating from the reference owns Keras artifacts: generators /
discriminators built by ``unet_generator`` (reference models/generator.py:22)
and ``discriminator`` (reference models/discriminator.py:14), saved as
SavedModel directories or ``.h5`` files (reference utils.py:133-167 exports
SavedModels; cgan.py:21-29 loads ``.h5`` prior models).  This module converts
those into our Flax modules + params:

    gen,  params = compat.load_tf_generator("gen_dir_or.h5")
    disc, params = compat.load_tf_discriminator("disc.h5")
    prior        = compat.prior_from_tf_generator("prior.h5", "down2")
    state, wf, is3d = compat.load_reference_checkpoint("checkpoints/train_x")
    #   ^ FULL training state (params + 4 Adam m/v/step) from a reference
    #     tf.train.Checkpoint; EM2EM.from_reference_checkpoint wraps this.
    compat.export_tf_savedmodel("our_export_dir", "tf_savedmodel_dir")  # reverse

Weight mapping (proven against the LIVE reference models in
tests/test_tf_parity.py, the frozen goldens in tests/test_goldens.py, and
the save->load round-trip in the same file):

* Keras functional models enumerate layers in build order; nested sub-models
  (the reference's ``downsample`` returns two models SHARING layers,
  models/utils.py:85) are flattened depth-first with dedupe by variable id.
* Plain convs store kernels as (*spatial, Cin, Cout) in both frameworks —
  copied verbatim.  ``Conv*DTranspose`` stores (*spatial, Cout, Cin) —
  the last two axes are swapped (see ops/convs.py:84-132).
* Reference convs are bias-free except the discriminator's final 1x1
  (Keras default use_bias there) — matching our modules exactly.

Width factor ``wf`` and 2D/3D-ness are inferred from the weights themselves
(stem width = 64//wf, reference generator.py:53; kernel rank 5 == 3D), so no
sidecar metadata is needed.

Requires tensorflow only at call time (the rest of the package never
imports TF).
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence, Tuple

import jax
import numpy as np

from .models.discriminator import Discriminator
from .models.generator import UNetGenerator

# (submodule path, nested conv) in reference build order — generator
# (reference models/generator.py:53-115; our models/generator.py:56-83).
GEN_SLOTS: Tuple[Tuple[str, str | None], ...] = (
    ("stem", None), ("down1", "conv"), ("down1", "down"),
    ("down2", "conv"), ("down2", "down"), ("up1", "conv"), ("up1", "up"),
    ("mid", None), ("up0", "conv"), ("up0", "up"),
    ("head", None), ("out", None))

# Discriminator orders (reference models/discriminator.py:39-103; the 2D
# model never builds down1 — the HACK quirk, discriminator.py:44-55).
DISC_SLOTS_3D: Tuple[Tuple[str, str | None], ...] = (
    ("down1", "conv"), ("down1", "down"), ("hack", None),
    ("down2", "conv"), ("down2", "down"), ("down3", "conv"),
    ("down3", "down"), ("head", None), ("out", None))
DISC_SLOTS_2D: Tuple[Tuple[str, str | None], ...] = (
    ("hack", None), ("down2", "conv"), ("down2", "down"),
    ("down3", "conv"), ("down3", "down"), ("head", None), ("out", None))

WeightGroup = Tuple[str, List[np.ndarray], str]  # (name, arrays, class_name)


def _as_keras_model(source):
    """Accept a live Keras model or a path (.h5 file / SavedModel dir)."""
    if isinstance(source, str):
        import tensorflow as tf
        return tf.keras.models.load_model(source, compile=False)
    return source


def keras_conv_weights(model, trainable_only: bool = False
                       ) -> List[WeightGroup]:
    """All unique weight groups of a Keras functional model, build order,
    nested sub-models flattened, shared layers deduped.

    Dedupe is two-level: by variable id (live models — the reference's
    ``downsample`` returns two models SHARING layer objects), and by
    (layer name, value digest) — an ``.h5``/SavedModel round trip loses
    object sharing and materializes each shared layer once per nested
    model, with identical names and identical values.  Distinct layers
    that merely collide on name (Keras reuses nested-model layer names)
    keep different values and survive.

    ``trainable_only``: skip layers that are frozen themselves OR sit
    inside a frozen nested model (tracked through the recursion — a frozen
    parent does not flip its children's own ``trainable`` flags).  This is
    how a ``disc_prior`` sub-model (reference cgan.py:21-29 sets
    ``trainable=False``) is excluded from a prior-carrying discriminator.
    """
    import hashlib

    import tensorflow as tf
    out: List[WeightGroup] = []
    seen_ids: set = set()
    seen_sigs: set = set()

    def visit(layer, frozen=False):
        frozen = frozen or not layer.trainable
        if isinstance(layer, tf.keras.Model) and layer is not model:
            for sub in layer.layers:
                visit(sub, frozen)
        elif layer.weights:
            if trainable_only and frozen:
                return
            fresh = [w for w in layer.weights if id(w) not in seen_ids]
            if not fresh:
                return
            arrays = [np.asarray(w) for w in fresh]
            h = hashlib.sha1()
            for a in arrays:
                h.update(np.ascontiguousarray(a).tobytes())
            sig = (layer.name, h.hexdigest())
            if sig in seen_sigs:
                return
            seen_ids.update(id(w) for w in fresh)
            seen_sigs.add(sig)
            out.append((layer.name, arrays, type(layer).__name__))

    for layer in model.layers:
        visit(layer)
    return out


def savedmodel_conv_weights(path: str) -> List[WeightGroup]:
    """Conv weight groups from a TF SavedModel's restored VARIABLES.

    ``tf.keras.models.load_model`` cannot revive a SavedModel as a Keras
    model under Keras 3 (and a Keras-3 ``model.export()`` artifact has no
    Keras metadata at all), but ``tf.saved_model.load(path).variables``
    exposes every weight in the model's build order for both vintages.
    Non-conv state (dropout seed_generator vars) is skipped; a bias
    variable joins the preceding kernel's group (the reference's only
    biased conv is the discriminator head's 1x1).  Transposed-conv kernels
    are NOT distinguishable by class here — callers map groups onto slots,
    and ``assign_weights`` swaps axes for ``sub == "up"`` slots; per-slot
    shape checks catch any ordering surprise.
    """
    import tensorflow as tf
    obj = tf.saved_model.load(path)
    variables = getattr(obj, "variables", None)
    if variables is None:
        raise ValueError(
            f"SavedModel at {path!r} exposes no variables — not a "
            "Keras-exported model?")
    groups: List[WeightGroup] = []
    for v in variables:
        name = v.name.split(":")[0]
        layer, _, kind = name.rpartition("/")
        arr = np.asarray(v)
        if kind == "kernel" and arr.ndim >= 4:
            groups.append((layer, [arr], "SavedModelVariable"))
        elif kind == "bias":
            if not (groups and groups[-1][0] == layer):
                raise ValueError(
                    f"bias variable {v.name!r} has no preceding kernel of "
                    f"layer {layer!r} to join — silently dropping it would "
                    "zero that layer's bias; not a reference-architecture "
                    "SavedModel?")
            groups[-1][1].append(arr)
    return groups


def params_geometry(params) -> Tuple[int, bool]:
    """``(wf, is3d)`` from converted generator params — the single place
    the stem-kernel inference rule lives (width 64//wf, reference
    generator.py:53; rank-5 kernel == 3D)."""
    k = params["params"]["stem"]["kernel"]
    return 64 // int(k.shape[-1]), k.ndim == 5


def _conv_weight_groups(source, trainable_only: bool = False
                        ) -> List[WeightGroup]:
    """Weight groups from a live model, ``.h5``/``.keras`` file, or a TF
    SavedModel directory (routed through the variables loader above)."""
    if isinstance(source, str) and os.path.isdir(source) and os.path.exists(
            os.path.join(source, "saved_model.pb")):
        if trainable_only:
            raise ValueError(
                "a prior-carrying discriminator can only be converted from "
                "a live Keras model or .h5 file: SavedModel variables do "
                "not reliably record layer-level freezing, so the prior's "
                "weights cannot be told apart")
        return savedmodel_conv_weights(source)
    return keras_conv_weights(_as_keras_model(source), trainable_only)


def assign_weights(params, slots: Sequence[Tuple[str, str | None]],
                   groups: Sequence[WeightGroup]):
    """Copy reference weight groups (build order) into our param tree.

    Returns a NEW params pytree; shapes are checked slot by slot.
    """
    if len(groups) != len(slots):
        raise ValueError(
            f"weight-group count {len(groups)} != expected {len(slots)} "
            f"slots — not a reference-architecture model? "
            f"(groups: {[n for n, _, _ in groups]})")
    p = jax.tree.map(lambda v: v, params["params"])  # structural copy
    for (path, sub), (name, arrays, cls) in zip(slots, groups):
        tgt = p[path] if sub is None else p[path][sub]
        for arr in arrays:
            if arr.ndim >= 4:  # conv kernel
                if "Transpose" in cls or sub == "up":
                    arr = np.swapaxes(arr, -1, -2)
                if tuple(tgt["kernel"].shape) != arr.shape:
                    raise ValueError(
                        f"kernel shape mismatch at {path}/{sub or ''} "
                        f"({name}): ours {tuple(tgt['kernel'].shape)} vs "
                        f"theirs {arr.shape}")
                tgt["kernel"] = arr
            else:
                if "bias" not in tgt:
                    raise ValueError(
                        f"reference layer {name} carries a bias but our "
                        f"{path}/{sub or ''} slot has none")
                tgt["bias"] = arr
    return {"params": p}


def _template_params(module, is3d: bool, dimsize: int):
    import jax.numpy as jnp
    sp = (dimsize,) * (3 if is3d else 2)
    return jax.eval_shape(
        lambda k: module.init(k, jnp.zeros((1,) + sp + (1,), jnp.float32)),
        jax.random.PRNGKey(0))


def _concretize(abstract):
    """eval_shape gives an abstract tree; materialize zeros for assignment
    (every leaf is overwritten, so values never matter — this skips running
    a real init)."""
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), abstract)


def load_tf_generator(source) -> Tuple[UNetGenerator, dict]:
    """Reference Keras generator (model/.h5/SavedModel) -> (module, params).

    ``wf`` and 2D/3D are inferred from the stem conv (width 64//wf,
    reference generator.py:53; rank 5 kernels == 3D).
    """
    groups = _conv_weight_groups(source)
    if not groups or groups[0][1][0].ndim < 4:
        raise ValueError("first weight group is not a conv kernel")
    stem = groups[0][1][0]
    is3d = stem.ndim == 5
    wf = 64 // int(stem.shape[-1])
    gen = UNetGenerator(wf=wf)
    params = _concretize(_template_params(gen, is3d, 74))
    return gen, assign_weights(params, GEN_SLOTS, groups)


def load_tf_discriminator(source, disc_prior=None
                          ) -> Tuple[Discriminator, dict]:
    """Reference Keras discriminator -> (module, params); wf / 2D-3D
    inferred (3D: 9 weight groups starting at down1; 2D: 7 starting at the
    16-wide hack conv — the reference 2D model never materializes down1).

    ``disc_prior``: for a discriminator built WITH a prior (reference
    discriminator.py:62-70), pass the same frozen feature extractor; the
    prior sub-model's weights are frozen in the Keras asset and are
    excluded from the slot mapping (they ride the callable instead), while
    the post-concat convs keep their prior-widened shapes."""
    groups = _conv_weight_groups(source, trainable_only=disc_prior is not None)
    if not groups:
        raise ValueError("no conv weight groups found in the Keras model")
    first = groups[0][1][0]
    is3d = first.ndim == 5
    if is3d:
        wf = 64 // int(first.shape[-1])          # down1 conv = 64//wf
        slots = DISC_SLOTS_3D
    else:
        if len(groups) < 2:
            raise ValueError("too few weight groups for a discriminator")
        wf = 256 // int(groups[1][1][0].shape[-1])  # down2 conv = 256//wf
        slots = DISC_SLOTS_2D
    disc = Discriminator(is3d=is3d, wf=wf, disc_prior=disc_prior)
    params = _concretize(_template_params(disc, is3d, 40))
    return disc, assign_weights(params, slots, groups)


def _group_arrays(arrays: Sequence[np.ndarray]) -> List[WeightGroup]:
    """Flat build-order arrays -> weight groups: each >=4-D kernel starts a
    group, a following low-rank bias joins its layer's group."""
    groups: List[WeightGroup] = []
    for a in arrays:
        if a.ndim >= 4:
            groups.append(("ckpt", [a], "SavedModelVariable"))
        elif groups:
            groups[-1][1].append(a)
        else:
            raise ValueError("weight list does not start with a conv kernel")
    return groups


def _ckpt_modern(rd, keys, name):
    """Keras-3 tf.train.Checkpoint layout: weights under
    '<name>_optimizer/_trainable_variables/<i>', Adam m/v paired per
    variable in '<name>_optimizer/_variables/<j>' (j ascending: m, v for
    var 0, then var 1, ...), step in '_iterations'."""
    import re
    pref = f"{name}_optimizer/"
    tv, sv = {}, {}
    for k in keys:
        m = re.match(re.escape(pref) + r"_trainable_variables/(\d+)/", k)
        if m:
            tv[int(m.group(1))] = rd.get_tensor(k)
            continue
        m = re.match(re.escape(pref) + r"_variables/(\d+)/", k)
        if m:
            sv[int(m.group(1))] = rd.get_tensor(k)
    ws = [tv[i] for i in range(len(tv))]
    if not ws:
        raise ValueError(
            f"{name}: no weights under "
            f"{pref + '_trainable_variables/'!r} — "
            "checkpoint saved before the optimizer was built?")
    idx = sorted(sv)
    if len(idx) != 2 * len(ws):
        raise ValueError(
            f"{name}: {len(idx)} optimizer slot tensors for {len(ws)} "
            "weights (expected m+v per weight)")
    ms = [sv[idx[2 * i]] for i in range(len(ws))]
    vs = [sv[idx[2 * i + 1]] for i in range(len(ws))]
    it = int(rd.get_tensor(pref + "_iterations/.ATTRIBUTES/VARIABLE_VALUE"))
    return ws, ms, vs, it


_ATTR_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _slot_key(weight_key: str, opt_name: str, slot: str) -> str:
    """Adam slot path for a Keras-2-era object-graph weight key (slot
    association rides the weight path itself) — ONE definition shared by
    trainable extraction (_ckpt_legacy) and frozen-prior detection
    (_frozen_disc_y_arrays), which must agree on it exactly."""
    return (weight_key[:-len(_ATTR_SUFFIX)]
            + f"/.OPTIMIZER_SLOT/{opt_name}/{slot}" + _ATTR_SUFFIX)


def _frozen_disc_y_arrays(rd, keys) -> List[np.ndarray]:
    """Weights of discriminator_y's FROZEN sub-model (its ``disc_prior``,
    reference cgan.py:21-29 / discriminator.py:62-70) as stored in the
    checkpoint, build order.  Both layouts keep them: the Keras-3 layout
    stores non-trainables under the model's own object path
    ('discriminator_y/_operations/.../_kernel'), the Keras-2-era layout
    stores them like any weight but WITHOUT Adam .OPTIMIZER_SLOT keys
    (frozen variables get no slots).  Empty list == no frozen sub-model
    (the run was trained without a prior)."""
    import re
    suffix = "/.ATTRIBUTES/VARIABLE_VALUE"
    keyset = set(keys)
    out = []
    # Keras-3: model-path keys exist only for variables the optimizer does
    # not already track, i.e. exactly the frozen ones.
    modern = [k for k in keys
              if k.startswith("discriminator_y/")
              and (k.endswith("/_kernel" + suffix)
                   or k.endswith("/_bias" + suffix))]
    modern.sort(key=lambda k: tuple(
        int(n) for n in re.findall(r"_operations/(\d+)", k)))
    out.extend(modern)
    # Keras-2-era: weight keys with no Adam m slot.
    legacy = [k for k in keys
              if k.startswith("discriminator_y/")
              and ".OPTIMIZER_SLOT" not in k
              and (k.endswith("/kernel" + suffix)
                   or k.endswith("/bias" + suffix))
              and _slot_key(k, "discriminator_y_optimizer", "m")
              not in keyset]
    legacy.sort(key=lambda k: tuple(
        int(n) for n in re.findall(r"layer_with_weights-(\d+)", k)))
    out.extend(legacy)
    return [rd.get_tensor(k) for k in out]


def _check_prior_matches(frozen: Sequence[np.ndarray], disc_prior) -> None:
    """Cross-check a passed ``disc_prior`` against the frozen prior weights
    the checkpoint itself stores: a retrained / wrong prior with identical
    architecture would otherwise import silently and diverge from the run
    it claims to continue.  Priors built by this package (``_tap_prior``)
    expose ``.params``; opaque callables are skipped with a warning
    (nothing to compare — a wrong one would import silently)."""
    if not frozen:
        return
    tree = getattr(disc_prior, "params", None)
    if tree is None:
        import warnings
        warnings.warn(
            "disc_prior exposes no .params — cannot cross-check it against "
            "the frozen prior weights the checkpoint stores; a wrong prior "
            "of the right architecture would import silently and diverge "
            "from the run it continues.  Build the prior with "
            "create_prior_helper()/prior_from_tf_generator() to enable the "
            "check.", stacklevel=3)
        return
    leaves = [np.asarray(l) for l in jax.tree.leaves(tree)]
    for i, arr in enumerate(frozen):
        arr = np.asarray(arr)
        cands = [arr] if arr.ndim < 4 else [arr, np.swapaxes(arr, -1, -2)]
        if not any(l.shape == c.shape and np.allclose(l, c, atol=1e-6)
                   for l in leaves for c in cands):
            raise ValueError(
                f"disc_prior mismatch: frozen prior weight {i} (shape "
                f"{arr.shape}) stored in the checkpoint matches no "
                "parameter of the passed disc_prior — wrong prior model? "
                "Pass the same frozen prior the run was trained with "
                "(reference cgan.py:21-29)")


def _ckpt_legacy(rd, keys, name):
    """Keras-2-era layout (what the reference shipped against): weights at
    '<name>/layer_with_weights-.../{kernel,bias}/.ATTRIBUTES/VARIABLE_VALUE'
    (nested sub-models nest the layer_with_weights path; numeric-tuple sort
    of those indices restores build order), Adam slots at the weight path +
    '.OPTIMIZER_SLOT/<name>_optimizer/{m,v}', step at '<name>_optimizer/
    iter'.  Slot association rides the weight path, so it is robust to any
    nesting; per-slot shape checks downstream guard the ordering.

    Only weights WITH an Adam m slot are extracted: a frozen ``disc_prior``
    sub-model's weights live in the object graph too (the prior Keras model
    is a tracked layer of discriminator_y) but, being non-trainable, get no
    optimizer slots — the same trainables-only contract the Keras-3 layout
    gives for free via ``_trainable_variables``."""
    import re
    suffix = _ATTR_SUFFIX
    slot = lambda k, s: _slot_key(k, f"{name}_optimizer", s)
    keyset = set(keys)
    cands = [k for k in keys
             if k.startswith(name + "/") and ".OPTIMIZER_SLOT" not in k
             and (k.endswith("/kernel" + suffix)
                  or k.endswith("/bias" + suffix))]
    wkeys = [k for k in cands if slot(k, "m") in keyset]
    if cands and not wkeys:
        # Don't degrade into a misleading "0 weight groups" error below:
        # a checkpoint saved before the first optimizer step (Keras Adam
        # creates m/v slots lazily in apply_gradients) or with a different
        # optimizer node name has weights but no slots.
        raise ValueError(
            f"{name}: found {len(cands)} weights but none has an Adam "
            f"slot at e.g. {slot(cands[0], 'm')!r} — checkpoint saved "
            f"before any training step, or a non-'{name}_optimizer' "
            "optimizer name?")

    def order(k):
        nums = tuple(int(n) for n in re.findall(r"layer_with_weights-(\d+)",
                                                k))
        return nums + (0 if k.endswith("/kernel" + suffix) else 1,)

    wkeys.sort(key=order)
    ws = [rd.get_tensor(k) for k in wkeys]
    ms = [rd.get_tensor(slot(k, "m")) for k in wkeys]
    vs = [rd.get_tensor(slot(k, "v")) for k in wkeys]
    it = int(rd.get_tensor(f"{name}_optimizer/iter" + suffix))
    return ws, ms, vs, it


def load_reference_checkpoint(ckpt_path: str, disc_prior=None):
    """Reference ``tf.train.Checkpoint`` (cgan.py:86-95) -> full
    ``CycleGANState``: all 4 models' weights AND the 4 Adam optimizers'
    m/v slots + step counts, so a reference training RUN continues here
    with its optimizer memory intact (our Adam implements tf.keras Adam's
    exact update rule, train/state.py).  Returns ``(state, wf, is3d)``;
    use ``EM2EM.from_reference_checkpoint`` for the one-call version.

    ``ckpt_path``: a checkpoint prefix (``.../ckpt-12``) or a directory
    containing one (``tf.train.latest_checkpoint`` is consulted).  Both
    on-disk layouts are handled — the Keras-2-era object-graph layout the
    reference shipped against and the Keras-3 layout current TF writes —
    with per-slot shape checks (transposed-conv kernels and their m/v are
    axis-swapped like all other imports in this module).

    ``disc_prior``: for a run trained WITH a prior (reference cgan.py:59
    passes it to discriminator_y), pass the SAME frozen feature extractor —
    e.g. ``create_prior_helper(prior.h5, "down1")`` on the original prior
    model — so discriminator_y's post-concat conv shapes match.  The
    prior's own (frozen) weights ride the callable; the copies the
    checkpoint stores (slot-less) are not imported but ARE cross-checked
    against the passed prior, so a wrong prior of the right architecture
    is refused instead of silently diverging from the run."""
    import tensorflow as tf
    if os.path.isdir(ckpt_path):
        latest = tf.train.latest_checkpoint(ckpt_path)
        if latest is None:
            raise ValueError(f"no TF checkpoint found under {ckpt_path!r}")
        ckpt_path = latest
    rd = tf.train.load_checkpoint(ckpt_path)
    keys = sorted(rd.get_variable_to_shape_map())
    if any(k.startswith("generator_g_optimizer/_trainable_variables/")
           for k in keys):
        extract = _ckpt_modern
    elif any(k.startswith("generator_g/layer_with_weights") for k in keys):
        extract = _ckpt_legacy
        if not any(".OPTIMIZER_SLOT" in k for k in keys):
            # Keras-2-era Adam creates m/v slots lazily in apply_gradients:
            # an all-slot-less checkpoint was saved before the first
            # train_step.  Diagnose that HERE — the slot-less-means-frozen
            # heuristic below would otherwise misread every discriminator_y
            # weight as a disc_prior's and demand a prior that never existed.
            raise ValueError(
                "checkpoint has no Adam optimizer slots at all — it was "
                "saved before any training step (Keras creates m/v slots "
                "lazily in apply_gradients); import a checkpoint written "
                "after at least one train_step, or load the weights via "
                "load_tf_generator/load_tf_discriminator instead")
    elif any(k.startswith("generator_g/") for k in keys):
        raise ValueError(
            "checkpoint stores generator_g but no optimizer variables — "
            "saved before the optimizer was built / before any training "
            "step; import a checkpoint written after at least one "
            "train_step")
    else:
        raise ValueError(
            "not a reference EM2EM checkpoint (no generator_g weights in "
            "either the Keras-2 or Keras-3 layout); keys start with: "
            f"{sorted({k.split('/')[0] for k in keys})}")

    # The checkpoint itself records whether the run used a disc_prior: the
    # prior's frozen weights are saved with discriminator_y (under the model
    # object path in the Keras-3 layout; slot-less in the Keras-2-era one).
    frozen = _frozen_disc_y_arrays(rd, keys)
    if frozen and disc_prior is None:
        raise ValueError(
            f"checkpoint stores {len(frozen)} frozen prior weights under "
            "discriminator_y — the run was trained WITH a disc_prior "
            "(reference cgan.py:59) — but none was passed; rebuild the "
            "run's frozen prior (e.g. create_prior_helper(prior.h5, "
            "last_layer)) and pass it as disc_prior=")
    _check_prior_matches(frozen, disc_prior)

    import jax.numpy as jnp
    import optax

    per_model = {}
    for name in ("generator_g", "generator_f", "discriminator_x",
                 "discriminator_y"):
        per_model[name] = extract(rd, keys, name)

    stem = per_model["generator_g"][0][0]
    is3d = stem.ndim == 5
    wf = 64 // int(stem.shape[-1])
    gen = UNetGenerator(wf=wf)
    disc = Discriminator(is3d=is3d, wf=wf)
    # The prior widens disc_y's post-concat convs (reference
    # discriminator.py:62-70); disc_x never carries one (cgan.py:58-59).
    disc_y_mod = Discriminator(is3d=is3d, wf=wf, disc_prior=disc_prior)
    disc_slots = DISC_SLOTS_3D if is3d else DISC_SLOTS_2D

    def convert(name, module, slots, dimsize):
        ws, ms, vs, it = per_model[name]
        try:
            # Template construction is INSIDE the guard: a prior tapped at
            # the wrong layer fails here first (the concat of mismatched
            # spatial grids), and deserves the disc_prior hint below, not a
            # bare shape error.
            tmpl = _concretize(_template_params(module, is3d, dimsize))
            params = assign_weights(tmpl, slots, _group_arrays(ws))
            mu = assign_weights(tmpl, slots, _group_arrays(ms))
            nu = assign_weights(tmpl, slots, _group_arrays(vs))
        except (TypeError, ValueError) as e:
            if name == "discriminator_y":
                raise ValueError(
                    f"{e} — discriminator_y's shapes depend on its "
                    "disc_prior: a run trained with one needs the same "
                    "frozen prior callable passed as disc_prior= (and one "
                    "trained without must not pass one)") from e
            raise
        to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
        opt = optax.ScaleByAdamState(
            count=jnp.asarray(it, jnp.int32),
            mu=to_jnp(mu), nu=to_jnp(nu))
        return to_jnp(params), opt, it

    gg, opt_gg, it = convert("generator_g", gen, GEN_SLOTS, 74)
    gf, opt_gf, _ = convert("generator_f", gen, GEN_SLOTS, 74)
    dx, opt_dx, _ = convert("discriminator_x", disc, disc_slots, 40)
    dy, opt_dy, _ = convert("discriminator_y", disc_y_mod, disc_slots, 40)

    from .train.state import CycleGANState
    state = CycleGANState(step=jnp.asarray(it, jnp.int32),
                          gg=gg, gf=gf, dx=dx, dy=dy,
                          opt_gg=opt_gg, opt_gf=opt_gf,
                          opt_dx=opt_dx, opt_dy=opt_dy)
    return state, wf, is3d


def export_tf_savedmodel(model_dir: str, out_dir: str,
                         platforms: Sequence[str] = ("cpu", "tpu",
                                                     "cuda")) -> None:
    """Export one of OUR saved generators as a TF SavedModel — the reverse
    of ``load_tf_generator``, so a reference user's TF serving stack can run
    a TPU-trained model.

    ``model_dir`` is an ``infer.export.save_model`` output (generator.msgpack
    + meta.json); ``out_dir`` receives a TF SavedModel with

    * a ``serving_default`` signature (float32 ``(batch, *spatial, 1)`` ->
      float32), usable from TF-Serving and Keras 3's ``TFSMLayer``;
    * a restored ``predict`` tf.function, so ``tf.saved_model.load(out_dir)``
      yields an object the reference's tiled-inference loop can call in place
      of ``model.predict`` (reference utils.py:107-108);
    * the same ``meta.json`` the reference's loaders read next to the model
      (reference utils.py:29-36 — buffer / outdimsize / meanstd_x /
      meanstd_y keys).

    The generator weights are frozen into the graph via ``jax2tf`` (StableHLO
    native serialization; batch dimension polymorphic).  ``platforms`` picks
    the StableHLO lowering targets — the default makes ONE portable artifact
    for CPU serving (the reference's Cloud Run stack is CPU), GPU, and TPU;
    without it jax2tf lowers only for the exporting process's platform and
    the SavedModel refuses to run anywhere else.  Note for Keras-2-era
    stacks (TF <= 2.15, what the reference shipped against):
    ``tf.keras.models.load_model`` there only revives Keras-authored
    SavedModels — load with ``tf.saved_model.load`` instead; the numerics are
    verified against our generator in tests/test_tf_parity.py.
    """
    import shutil

    import tensorflow as tf
    from jax.experimental import jax2tf

    from .infer.export import META_FILE, load_generator

    gen, params, meta = load_generator(model_dir)
    rank = 3 if meta.is3d else 2
    spatial = (meta.dimsize,) * rank
    poly = "(b, " + ", ".join(str(d) for d in spatial) + ", 1)"
    converted = jax2tf.convert(lambda x: gen.apply(params, x),
                               polymorphic_shapes=[poly],
                               native_serialization_platforms=tuple(platforms),
                               with_gradient=False)
    call = tf.function(
        converted,
        input_signature=[tf.TensorSpec((None,) + spatial + (1,), tf.float32,
                                       name="input")],
        autograph=False)
    module = tf.Module()
    module.predict = call
    tf.saved_model.save(module, out_dir,
                        signatures={"serving_default": call})
    shutil.copyfile(os.path.join(model_dir, META_FILE),
                    os.path.join(out_dir, META_FILE))


def prior_from_tf_generator(source, last_layer: str) -> Callable:
    """Frozen feature extractor from a reference-architecture Keras model
    (the create_prior_helper .h5 contract, reference cgan.py:21-29).

    The Keras weights are converted to Flax and the named submodule's output
    is tapped (``last_layer``: "down1", "down2", "mid", ... — our submodule
    names, since Keras layer indices don't survive conversion).  Returns a
    callable suitable as ``disc_prior``.
    """
    from .train.cgan import _tap_prior
    gen, params = load_tf_generator(source)
    return _tap_prior(gen, params, last_layer)
