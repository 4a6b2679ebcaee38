"""Cross-check our full-res parameter inventory against the reference
TF checkpoint index (`/root/reference/pretrained_model/pretrained_model.ckpt.index`).

The reference ships only the checkpoint *index* (the data blob is listed in
`.MISSING_LARGE_BLOBS`), but the index carries every variable name + shape of
the trained graph (pwclo_model.py:30-433) — exactly what is needed to verify
that our Flax PWCLO-Net reproduces the reference architecture layer-for-layer
and width-for-width.

Name mapping (reference scope -> our Flax module):
  sa1/layer{i}/conv{j}              -> down_l{i}/mlp/dense_{j}     (+ bn_{j})
  flow_embedding_l2_origin          -> cv_origin
  flow_embedding_l{i}               -> cv_l{i}
    CV_{j}                          ->   cv_mlp1/dense_{j}
    CV_xyz                          ->   cv_xyz/dense_0
    sum_xyz_encoding                ->   cv_sum_xyz/dense_0
    sum_CV_{j}                      ->   cv_sum_mlp/dense_{j}
    sum_cost_volume_{j}             ->   cv_agg_mlp/dense_{j}
  new_layer3/conv{j}                -> cv_down_l3/mlp/dense_{j}
  up_sa_layer_layer_l{i}costvolume  -> up_feat_l{i}  (up_1_* -> mlp, up_2_* -> mlp2)
  up_sa_layer_layer_l{i}w           -> up_w_l{i}
  l{i}_costvolume_predict/conv_predictor{j} -> pred_feat_l{i}/mlp/dense_{j}
  l{i}_w_predict/conv_predictor{j}  -> pred_w_l{i}/mlp/dense_{j}
  l3_costvolume_predict_ww          -> l3_w_predictor/mlp
  l{i}_big | l3_big                 -> head_l{i}/big/dense | l3_head/big/dense
  l{i}_{q,t}_det | l3_{q,t}_coarse  -> head_l{i}/{q,t}_head | l3_head/...
  w_x, w_q (scalars)                -> TrainState.params["w_x"/"w_q"]
  Variable (int32 scalar)           -> TrainState.step (global step, main.py:148)

Per-layer leaves: weights [1,1,Cin,Cout] or conv1d [1,Cin,Cout] -> kernel
(Cin,Cout); biases -> bias; bn/beta -> bn/bias; bn/gamma -> bn/scale;
bn/moving_mean -> batch_stats .../mean; bn/moving_variance -> .../var.

Run: python tools/param_crosscheck.py  (writes docs/param_crosscheck.md)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_CKPT = "/root/reference/pretrained_model/pretrained_model.ckpt"


def reference_inventory(ckpt_path: str = REFERENCE_CKPT) -> dict:
    """{var_name: shape tuple} for model variables (optimizer slots dropped)."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    return {
        name: tuple(shape)
        for name, shape in shape_map.items()
        if "/Adam" not in name and name not in ("beta1_power", "beta2_power")
    }


def our_inventory() -> dict:
    """{flat_path: shape tuple} over params + batch_stats of the full-res
    model, via eval_shape (no compute)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig
    from efficientlo_net_tpu.models.pwclo import PWCLONet

    cfg = ModelConfig()
    model = PWCLONet(cfg)
    h, w = cfg.sensor.height, cfg.sensor.width
    p = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    rngs = {
        "params": jax.random.key(0),
        "neighbor": jax.random.key(1),
        "dropout": jax.random.key(2),
    }
    tree = jax.eval_shape(
        lambda a, b: model.init(rngs, a, b, training=False), p, p
    )
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        out[key] = tuple(leaf.shape)
    # train-state extras that live outside the Flax tree
    out["params/w_x"] = ()
    out["params/w_q"] = ()
    out["step"] = ()
    return out


def _conv_leaves(ref_conv: str, ours_dense: str, ours_bn: str | None):
    """Leaf-level pairs for one reference conv2d/conv1d layer."""
    pairs = [
        (f"{ref_conv}/weights", f"params/{ours_dense}/kernel", "squeeze"),
        (f"{ref_conv}/biases", f"params/{ours_dense}/bias", None),
    ]
    if ours_bn is not None:
        pairs += [
            (f"{ref_conv}/bn/beta", f"params/{ours_bn}/bias", None),
            (f"{ref_conv}/bn/gamma", f"params/{ours_bn}/scale", None),
            (f"{ref_conv}/bn/moving_mean", f"batch_stats/{ours_bn}/mean", None),
            (f"{ref_conv}/bn/moving_variance", f"batch_stats/{ours_bn}/var", None),
        ]
    return pairs


def build_mapping() -> list:
    """[(ref_name, our_name, transform)] covering every reference model var."""
    pairs = []

    def mlp(ref_scope, ref_fmt, our_scope, n):
        for j in range(n):
            ref = f"{ref_scope}/{ref_fmt.format(j)}"
            pairs.extend(
                _conv_leaves(ref, f"{our_scope}/dense_{j}", f"{our_scope}/bn_{j}")
            )

    # Siamese set-conv pyramid (pwclo_model.py:117-165 scope 'sa1')
    for i in range(4):
        mlp("sa1", f"layer{i}/conv{{}}", f"down_l{i}/mlp", 3)

    # Cost volumes (pointnet_util.py:33-149)
    cv_scopes = [
        ("flow_embedding_l2_origin", "cv_origin"),
        ("flow_embedding_l2", "cv_l2"),
        ("flow_embedding_l1", "cv_l1"),
        ("flow_embedding_l0", "cv_l0"),
    ]
    for ref_s, our_s in cv_scopes:
        mlp(ref_s, "CV_{}", f"{our_s}/cv_mlp1", 3)
        pairs.extend(
            _conv_leaves(f"{ref_s}/CV_xyz", f"{our_s}/cv_xyz/dense_0", f"{our_s}/cv_xyz/bn_0")
        )
        pairs.extend(
            _conv_leaves(
                f"{ref_s}/sum_xyz_encoding",
                f"{our_s}/cv_sum_xyz/dense_0",
                f"{our_s}/cv_sum_xyz/bn_0",
            )
        )
        mlp(ref_s, "sum_CV_{}", f"{our_s}/cv_sum_mlp", 2)
        mlp(ref_s, "sum_cost_volume_{}", f"{our_s}/cv_agg_mlp", 2)

    # coarse CV -> l3 down_conv (pwclo_model.py:177 scope 'new_layer3')
    mlp("new_layer3", "conv{}", "cv_down_l3/mlp", 3)

    # up_convs (pointnet_util.py:254-316)
    for i in range(3):
        for ref_s, our_s in [
            (f"up_sa_layer_layer_l{i}costvolume", f"up_feat_l{i}"),
            (f"up_sa_layer_layer_l{i}w", f"up_w_l{i}"),
        ]:
            mlp(ref_s, "up_1_{}", f"{our_s}/mlp", 2)
            mlp(ref_s, "up_2_{}", f"{our_s}/mlp2", 2)

    # flow predictors (pointnet_util.py:153-175)
    for i in range(3):
        mlp(f"l{i}_costvolume_predict", "conv_predictor{}", f"pred_feat_l{i}/mlp", 2)
        mlp(f"l{i}_w_predict", "conv_predictor{}", f"pred_w_l{i}/mlp", 2)
    mlp("l3_costvolume_predict_ww", "conv_predictor{}", "l3_w_predictor/mlp", 2)

    # pose heads (pwclo_model.py:184-208 etc.) — conv1d, no BN
    head_scopes = [("l3", "l3_head", "coarse")] + [
        (f"l{i}", f"head_l{i}", "det") for i in range(3)
    ]
    for lv, our_head, suffix in head_scopes:
        pairs += [
            (f"{lv}_big/weights", f"params/{our_head}/big/dense/kernel", "squeeze"),
            (f"{lv}_big/biases", f"params/{our_head}/big/dense/bias", None),
            (f"{lv}_q_{suffix}/weights", f"params/{our_head}/q_head/dense/kernel", "squeeze"),
            (f"{lv}_q_{suffix}/biases", f"params/{our_head}/q_head/dense/bias", None),
            (f"{lv}_t_{suffix}/weights", f"params/{our_head}/t_head/dense/kernel", "squeeze"),
            (f"{lv}_t_{suffix}/biases", f"params/{our_head}/t_head/dense/bias", None),
        ]

    # scalars: learned loss weights (main.py:151-152) + global step (main.py:148)
    pairs += [
        ("w_x", "params/w_x", None),
        ("w_q", "params/w_q", None),
        ("Variable", "step", None),
    ]
    return pairs


def crosscheck():
    ref = reference_inventory()
    ours = our_inventory()
    mapping = build_mapping()

    mismatches, missing_ref, missing_ours = [], [], []
    used_ref, used_ours = set(), set()
    for ref_name, our_name, transform in mapping:
        if ref_name not in ref:
            missing_ref.append(ref_name)
            continue
        if our_name not in ours:
            missing_ours.append((ref_name, our_name))
            continue
        used_ref.add(ref_name)
        used_ours.add(our_name)
        ref_shape = ref[ref_name]
        if transform == "squeeze":  # [1,1,Cin,Cout] or [1,Cin,Cout] -> (Cin,Cout)
            ref_shape = tuple(s for s in ref_shape if s != 1) or (1,)
        if ref_shape != ours[our_name]:
            mismatches.append((ref_name, ref[ref_name], our_name, ours[our_name]))

    unmapped_ref = sorted(set(ref) - used_ref)
    unmapped_ours = sorted(
        k for k in set(ours) - used_ours
        # our model params not present in reference would be extras
    )
    return {
        "n_ref": len(ref),
        "n_ours": len(ours),
        "n_checked": len(used_ref),
        "mismatches": mismatches,
        "missing_ref": missing_ref,
        "missing_ours": missing_ours,
        "unmapped_ref": unmapped_ref,
        "unmapped_ours": unmapped_ours,
    }


def main():
    result = crosscheck()
    lines = [
        "# Parameter inventory cross-check vs reference checkpoint",
        "",
        "Generated by `tools/param_crosscheck.py` from",
        "`/root/reference/pretrained_model/pretrained_model.ckpt.index`",
        "(variable names + shapes of the trained reference graph) against",
        "`jax.eval_shape` of our full-resolution Flax PWCLO-Net.",
        "",
        f"- reference model variables: **{result['n_ref']}**",
        f"- our param/batch-stat leaves: **{result['n_ours']}**",
        f"- pairs checked: **{result['n_checked']}**",
        f"- shape mismatches: **{len(result['mismatches'])}**",
        f"- reference vars with no counterpart: **{len(result['unmapped_ref'])}**",
        f"- our leaves with no reference counterpart: **{len(result['unmapped_ours'])}**",
        "",
    ]
    if result["mismatches"]:
        lines.append("## Shape mismatches\n")
        lines.append("| reference | shape | ours | shape |")
        lines.append("|---|---|---|---|")
        for rn, rs, on, os_ in result["mismatches"]:
            lines.append(f"| `{rn}` | {list(rs)} | `{on}` | {list(os_)} |")
        lines.append("")
    for key, title in [
        ("missing_ref", "Mapping names absent from the reference index"),
        ("missing_ours", "Mapping names absent from our tree"),
        ("unmapped_ref", "Reference vars not covered by the mapping"),
        ("unmapped_ours", "Our leaves not covered by the mapping"),
    ]:
        if result[key]:
            lines.append(f"## {title}\n")
            for item in result[key]:
                lines.append(f"- `{item}`")
            lines.append("")
    if not (
        result["mismatches"]
        or result["missing_ref"]
        or result["missing_ours"]
        or result["unmapped_ref"]
        or result["unmapped_ours"]
    ):
        lines.append(
            "**Result: every reference variable maps to exactly one of our "
            "parameters with an identical shape, and vice versa.** The Flax "
            "model is architecturally identical to the trained reference "
            "graph (layer count, widths, BN placement, head dims)."
        )
    doc = "\n".join(lines) + "\n"
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "param_crosscheck.md",
    )
    with open(out_path, "w") as f:
        f.write(doc)
    print(doc)
    ok = not (result["mismatches"] or result["missing_ref"] or result["missing_ours"]
              or result["unmapped_ref"] or result["unmapped_ours"])
    print("CROSSCHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
