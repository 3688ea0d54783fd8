"""PyTorch checkpoint ingestion: reference state_dicts -> flax param trees.

Replicates the reference's multi-source checkpoint surgery
(`utils/setup/train_setup.py:136-291`): StyleSDF `g_ema` loads into the generator
(with the `renderer.network.` -> `netGlobal` prefix remap), the E3DGE ckpt provides
encoder / netLocal / ADA / fusion / volume-D weights, toonify swaps generator weights.

Implementation is flax-tree-driven: for every leaf path of OUR param tree we derive
the torch key + tensor transform, so coverage is complete by construction (any
unmapped leaf raises). Layout conventions:

  torch Linear   [out, in]        -> ours identical (custom layers) or transposed
                                     (flax nn.Dense kernels)
  torch Conv2d   [out, in, kh, kw]-> flax nn.Conv kernel [kh, kw, in, out]
  equalized/modulated convs       -> identical torch layouts (we keep them)
  BatchNorm                       -> scale/bias params + batch_stats mean/var

Use `load_torch_file` to read a .pt/.pth (requires torch, CPU) and the `ingest_*`
functions to produce param subtrees merged into `variables`.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np


def _t(x):
    return np.asarray(x)


def _conv_to_flax(w):  # torch OIHW -> flax HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _dense_to_flax(w):  # torch [out,in] -> flax nn.Dense kernel [in,out]
    return _t(w).transpose(1, 0)


def _identity(w):
    return _t(w)


def _conv1d_to_dense(w):  # torch Conv1d [out,in,1] -> flax nn.Dense kernel [in,out]
    return _t(w)[:, :, 0].transpose(1, 0)


def _reshape_bias4(w):  # [C] -> [1,C,1,1]
    return _t(w).reshape(1, -1, 1, 1)


Rule = tuple[str, Callable]


def _torchconv_rules(torch_prefix: str) -> dict[str, Rule]:
    return {
        "conv/kernel": (f"{torch_prefix}.weight", _conv_to_flax),
        "conv/bias": (f"{torch_prefix}.bias", _identity),
    }


def _bn_rules(torch_prefix: str) -> dict[str, Rule]:
    return {
        "bn/scale": (f"{torch_prefix}.weight", _identity),
        "bn/bias": (f"{torch_prefix}.bias", _identity),
        "bn/mean": (f"{torch_prefix}.running_mean", _identity),
        "bn/var": (f"{torch_prefix}.running_var", _identity),
    }


def _bottleneck_ir_rules(tp: str, se: bool) -> dict[str, Rule]:
    """bottleneck_IR(_SE): res_layer [bn, conv, prelu, conv, bn, (se)]."""
    rules: dict[str, Rule] = {}
    for ours, theirs in [
        ("shortcut_conv", f"{tp}.shortcut_layer.0"),
        ("conv1", f"{tp}.res_layer.1"),
        ("conv2", f"{tp}.res_layer.3"),
    ]:
        for k, v in _torchconv_rules(theirs).items():
            rules[f"{ours}/{k}"] = v
    for ours, theirs in [
        ("shortcut_bn", f"{tp}.shortcut_layer.1"),
        ("bn1", f"{tp}.res_layer.0"),
        ("bn2", f"{tp}.res_layer.4"),
    ]:
        for k, v in _bn_rules(theirs).items():
            rules[f"{ours}/{k}"] = v
    rules["prelu/alpha"] = (f"{tp}.res_layer.2.weight", _identity)
    if se:
        rules["se/fc1/conv/kernel"] = (f"{tp}.res_layer.5.fc1.weight", _conv_to_flax)
        rules["se/fc2/conv/kernel"] = (f"{tp}.res_layer.5.fc2.weight", _conv_to_flax)
    return rules


def _lookup(rules: dict[str, Rule], rel: str) -> Rule | None:
    return rules.get(rel)


def flax_path_to_torch(path: str) -> Rule | None:
    """Map one flax param path (joined with '/') to (torch_key, transform).

    Paths are relative to the E3DGE top module, e.g.
    'params/encoder/body_3/conv1/conv/kernel' or
    'batch_stats/encoder/input_bn/bn/mean'.
    """
    p = path.split("/")
    coll, top, rel = p[0], p[1], "/".join(p[2:])

    # ---------------- encoder (E0) — torch keys as in the E3DGE ckpt 'encoder'
    if top == "encoder":
        # variant encoders wrap the IR trunk in a 'backbone' submodule
        # (variants.py::_IRBackbone); torch keys are unprefixed either way
        if rel.startswith("backbone/"):
            rel = rel[len("backbone/") :]
        # ReStyle HybridBackboneEncoder thumb heads (restyle_psp_encoders.py:66-72)
        m = re.match(r"thumb_styles_(\d+)/(.+)", rel)
        if m:
            base, sub = f"thumb_styles.{m.group(1)}", m.group(2)
            mc = re.match(r"convs_(\d+)/(.+)", sub)
            if mc:
                return _lookup(_torchconv_rules(f"{base}.convs.{2 * int(mc.group(1))}"), mc.group(2))
            if sub == "linear/weight":
                return (f"{base}.linear.weight", _identity)
            if sub == "linear/bias":
                return (f"{base}.linear.bias", _identity)
        m = re.match(r"body_(\d+)/(.+)", rel)
        if m:
            i, sub = int(m.group(1)), m.group(2)
            return _lookup(_bottleneck_ir_rules(f"body.{i}", se=True), sub)
        if rel.startswith("input_conv/"):
            return _lookup(_torchconv_rules("input_layer.0"), rel[len("input_conv/") :])
        if rel.startswith("input_bn/"):
            return _lookup(_bn_rules("input_layer.1"), rel[len("input_bn/") :])
        if rel == "input_prelu/alpha":
            return ("input_layer.2.weight", _identity)
        m = re.match(r"latlayer(\d+)/(.+)", rel)
        if m:
            return _lookup(_torchconv_rules(f"latlayer{m.group(1)}"), m.group(2))
        m = re.match(r"styles_(pigan_|stylegan_|)(\d+)/(.+)", rel)
        if m:
            kind, i, sub = m.group(1), int(m.group(2)), m.group(3)
            # V2 torch names: styles_pigan.{i} / styles_stylegan.{i}
            # (fpn_encoders.py:300-320); the e4e Baseline's stylegan branch is
            # plain `styles.{i}` (e4e_encoders.py:401-426) — our bare
            # `styles_{i}` module names map there.
            base = f"styles_{kind[:-1]}.{i}" if kind else f"styles.{i}"
            mc = re.match(r"convs_(\d+)/(.+)", sub)
            if mc:
                return _lookup(_torchconv_rules(f"{base}.convs.{2 * int(mc.group(1))}"), mc.group(2))
            if sub == "linear/weight":
                return (f"{base}.linear.weight", _identity)
            if sub == "linear/bias":
                return (f"{base}.linear.bias", _identity)
        return None

    # ---------------- generator (StyleSDF g_ema)
    if top == "generator":
        # z->w mapping
        m = re.match(r"style/style_(\d+)/(weight|bias)", rel)
        if m:
            return (f"style.{m.group(1)}.{m.group(2)}", _identity)
        if rel == "renderer/sigmoid_beta":
            return ("renderer.sigmoid_beta", _identity)
        # SIREN network; reference may nest under netGlobal when local model on —
        # `normalize_g_ema_keys` handles that remap before we get here.
        m = re.match(r"renderer/network/(.+)", rel)
        if m:
            sub = m.group(1)
            m2 = re.match(r"(pts_linears_(\d+)|views_linears)/(.+)", sub)
            if m2:
                layer = m2.group(1)
                tl = f"pts_linears.{m2.group(2)}" if m2.group(2) else "views_linears"
                tail = m2.group(3)
                m3 = re.match(r"(gamma|beta)/(weight|bias)", tail)
                if m3:
                    return (f"renderer.network.{tl}.{m3.group(1)}.{m3.group(2)}", _identity)
                return (f"renderer.network.{tl}.{tail}", _identity)
            m2 = re.match(r"(rgb_linear|sigma_linear)/(weight|bias)", sub)
            if m2:
                return (f"renderer.network.{m2.group(1)}.{m2.group(2)}", _identity)
            return None
        # decoder (G1)
        m = re.match(r"decoder/(.+)", rel)
        if m:
            sub = m.group(1)
            m2 = re.match(r"style/style_(\d+)/(weight|bias)", sub)
            if m2:
                # torch Sequential: [PixelNorm, EqualLinear x5] -> index + 1
                return (f"decoder.style.{int(m2.group(1)) + 1}.{m2.group(2)}", _identity)
            m2 = re.match(r"(conv1|convs_(\d+))/(.+)", sub)
            if m2:
                tl = "decoder.conv1" if m2.group(1) == "conv1" else f"decoder.convs.{m2.group(2)}"
                tail = m2.group(3)
                if tail == "conv/weight":
                    return (f"{tl}.conv.weight", _identity)
                if tail == "conv/modulation/weight":
                    return (f"{tl}.conv.modulation.weight", _identity)
                if tail == "conv/modulation/bias":
                    return (f"{tl}.conv.modulation.bias", _identity)
                if tail == "noise/weight":
                    return (f"{tl}.noise.weight", _identity)
                if tail == "bias":
                    return (f"{tl}.activate.bias", _reshape_bias4)
                return None
            m2 = re.match(r"(to_rgb1|to_rgbs_(\d+))/(.+)", sub)
            if m2:
                tl = "decoder.to_rgb1" if m2.group(1) == "to_rgb1" else f"decoder.to_rgbs.{m2.group(2)}"
                tail = m2.group(3)
                if tail == "conv/weight":
                    return (f"{tl}.conv.weight", _identity)
                if tail == "conv/modulation/weight":
                    return (f"{tl}.conv.modulation.weight", _identity)
                if tail == "conv/modulation/bias":
                    return (f"{tl}.conv.modulation.bias", _identity)
                if tail == "bias":
                    return (f"{tl}.bias", _identity)
            return None
        return None

    # ---------------- volume discriminator
    if top == "volume_discriminator":
        m = re.match(r"convs_0/(.+)", rel)
        if m:
            sub = m.group(1)
            if sub == "conv/conv/kernel":
                return ("convs.0.conv.weight", _conv_to_flax)
            if sub == "act_bias":
                return ("convs.0.activation.bias", _identity)
        m = re.match(r"convs_(\d+)/(.+)", rel)
        if m and int(m.group(1)) > 0:
            i, sub = int(m.group(1)), m.group(2)
            m2 = re.match(r"(conv1|conv2)/(.+)", sub)
            if m2:
                tail = m2.group(2)
                if tail == "conv/conv/kernel":
                    return (f"convs.{i}.{m2.group(1)}.conv.conv.weight", _conv_to_flax)
                if tail == "act_bias":
                    return (f"convs.{i}.{m2.group(1)}.activation.bias", _identity)
            if sub == "skip/conv/conv/kernel":
                return (f"convs.{i}.skip.conv.weight", _conv_to_flax)
            if sub == "skip/conv/conv/bias":
                return (f"convs.{i}.skip.conv.bias", _identity)
        if rel == "final_conv/conv/conv/kernel":
            return ("final_conv.conv.weight", _conv_to_flax)
        if rel == "final_conv/conv/conv/bias":
            return ("final_conv.conv.bias", _identity)
        # VolumeRenderDiscriminatorEncoder W+ head (stylesdf_model.py:1429-1430)
        if rel == "wplus_latents_pred_conv/conv/conv/kernel":
            return ("wplus_latents_pred_conv.conv.weight", _conv_to_flax)
        if rel == "wplus_latents_pred_conv/conv/conv/bias":
            return ("wplus_latents_pred_conv.conv.bias", _identity)
        return None

    # ---------------- full-res G1 discriminator (stylesdf_model.py:1541-1617)
    # Torch side is nn.Sequential ConvLayers, so param indices skip the
    # param-free Blur: plain ConvLayer = (conv 0, act 1); downsample ConvLayer =
    # (blur 0, conv 1, act 2); skip = (blur 0, conv 1, no act). Our params keep
    # torch OIHW/[out,in] layouts (models/discriminator.py), so all _identity.
    if top == "discriminator":
        # StyleGANEncoder/DEncoder wrap the SG2-D conv pyramid in a 'trunk'
        # submodule (encoders/factory.py::_SG2Trunk); torch keys are unprefixed
        if rel.startswith("trunk/"):
            rel = rel[len("trunk/") :]
        table = {
            "convs_0/conv/weight": "convs.0.0.weight",
            "convs_0/bias": "convs.0.1.bias",
            "final_conv/conv/weight": "final_conv.0.weight",
            "final_conv/bias": "final_conv.1.bias",
            "final_linear_0/weight": "final_linear.0.weight",
            "final_linear_0/bias": "final_linear.0.bias",
            "final_linear_1/weight": "final_linear.1.weight",
            "final_linear_1/bias": "final_linear.1.bias",
        }
        if rel in table:
            return (table[rel], _identity)
        m = re.match(r"convs_(\d+)/(conv1/conv/weight|conv1/bias|conv2/conv/weight|conv2/bias|skip/conv/weight)", rel)
        if m and int(m.group(1)) > 0:
            i, sub = int(m.group(1)), m.group(2)
            sub_map = {
                "conv1/conv/weight": "conv1.0.weight",
                "conv1/bias": "conv1.1.bias",
                "conv2/conv/weight": "conv2.1.weight",
                "conv2/bias": "conv2.2.bias",
                "skip/conv/weight": "skip.1.weight",
            }
            return (f"convs.{i}.{sub_map[sub]}", _identity)
        return None

    # ---------------- E1 local net (netLocal)
    if top == "local":
        m = re.match(r"(residual_conv|depth_conv)/(.+)", rel)
        if m:
            name, sub = m.group(1), m.group(2)
            table = {
                "conv_in/conv/kernel": (f"{name}.0.weight", _conv_to_flax),
                # InstanceNorm (ResnetFC variant) params
                "rb_norm1/scale": (f"{name}.1.conv.0.weight", _identity),
                "rb_norm1/bias": (f"{name}.1.conv.0.bias", _identity),
                "rb_conv1/conv/kernel": (f"{name}.1.conv.2.weight", _conv_to_flax),
                "rb_norm2/scale": (f"{name}.1.conv.3.weight", _identity),
                "rb_norm2/bias": (f"{name}.1.conv.3.bias", _identity),
                "rb_conv2/conv/kernel": (f"{name}.1.conv.5.weight", _conv_to_flax),
                "conv_out/conv/kernel": (f"{name}.2.weight", _conv_to_flax),
            }
            # BatchNorm (HGPIFuNetGANResidual variant) params + running stats
            for ours, theirs in [("rb_norm1", f"{name}.1.conv.0"), ("rb_norm2", f"{name}.1.conv.3")]:
                for k, v in _bn_rules(theirs).items():
                    table[f"{ours}/{k}"] = v
            return table.get(sub)
        m = re.match(r"image_filter/(.+)", rel)
        if m:
            return _hgfilter_rule("image_filter", m.group(1))
        m = re.match(r"local_feat_to_tex_modulations/(.+)", rel)
        if m:
            table = {
                # EqualLinear tex head (HGPIFuNetGANResidual 'bn' variant)
                "weight": ("local_feat_to_tex_modulations_linear.weight", _identity),
                "bias": ("local_feat_to_tex_modulations_linear.bias", _identity),
                # ResnetBlockFC tex head (released ResnetFC variant)
                "fc_0_weight": ("local_feat_to_tex_modulations_linear.fc_0.weight", _identity),
                "fc_0_bias": ("local_feat_to_tex_modulations_linear.fc_0.bias", _identity),
                "fc_1_weight": ("local_feat_to_tex_modulations_linear.fc_1.weight", _identity),
                "fc_1_bias": ("local_feat_to_tex_modulations_linear.fc_1.bias", _identity),
                "shortcut_weight": ("local_feat_to_tex_modulations_linear.shortcut.weight", _identity),
            }
            return table.get(m.group(1))
        # geo-modulation head (L_pred_geo_modulations ablation: zero-init EqualLinear,
        # HGPIFuGANNetResidualInputResnetFC.py:81-84)
        m = re.match(r"local_feat_to_geo_modulations/(weight|bias)", rel)
        if m:
            return (f"local_feat_to_geo_modulations_linear.{m.group(1)}", _identity)
        # SurfaceClassifier conv1d MLP (SurfaceClassifier.py:6-68; stage-1 netLocal
        # pretraining head)
        m = re.match(r"surface_classifier/conv(\d)/(kernel|bias)", rel)
        if m:
            if m.group(2) == "kernel":
                return (f"surface_classifier.conv{m.group(1)}.weight", _conv1d_to_dense)
            return (f"surface_classifier.conv{m.group(1)}.bias", _identity)
        return None

    # ---------------- ADA aligner
    if top == "grid_align":
        if rel.startswith("conv_layer1_conv/"):
            return _lookup(_torchconv_rules("conv_layer1.0"), rel.split("/", 1)[1])
        if rel.startswith("conv_layer1_bn/"):
            return _lookup(_bn_rules("conv_layer1.1"), rel.split("/", 1)[1])
        if rel == "conv_layer1_prelu/alpha":
            return ("conv_layer1.2.weight", _identity)
        m = re.match(r"(d?conv_layer\d)_(\d)/(.+)", rel)
        if m:
            return _lookup(_bottleneck_ir_rules(f"{m.group(1)}.{m.group(2)}", se=False), m.group(3))
        return None

    # ---------------- SFT fusion
    if top == "fuse_sft_block":
        table = {
            "encode_enc/fc_0_weight": ("encode_enc.fc_0.weight", _identity),
            "encode_enc/fc_0_bias": ("encode_enc.fc_0.bias", _identity),
            "encode_enc/fc_1_weight": ("encode_enc.fc_1.weight", _identity),
            "encode_enc/fc_1_bias": ("encode_enc.fc_1.bias", _identity),
            "encode_enc/shortcut_weight": ("encode_enc.shortcut.weight", _identity),
            "scale_0/kernel": ("scale.0.weight", _dense_to_flax),
            "scale_0/bias": ("scale.0.bias", _identity),
            "scale_2/kernel": ("scale.2.weight", _dense_to_flax),
            "scale_2/bias": ("scale.2.bias", _identity),
            "shift_0/kernel": ("shift.0.weight", _dense_to_flax),
            "shift_0/bias": ("shift.0.bias", _identity),
            "shift_2/kernel": ("shift.2.weight", _dense_to_flax),
            "shift_2/bias": ("shift.2.bias", _identity),
        }
        return table.get(rel)

    return None


def arcface_path_to_torch(path: str) -> Rule | None:
    """ArcFace IR-SE-50 sd (model_ir_se50.pth, reference encoders/model_irse.py):
    torch names input_layer.{0,1,2}, body.{i}.*, output_layer.{0 bn,3 linear,4 bn1d}.

    Maps OUR training/perceptual.py::ArcFaceBackbone paths (pass paths relative to
    the backbone, e.g. 'params/facenet/body_3/conv1/conv/kernel' with top='facenet').
    """
    p = path.split("/")
    rel = "/".join(p[2:])
    if rel.startswith("input_conv/"):
        return _lookup(_torchconv_rules("input_layer.0"), rel.split("/", 1)[1])
    if rel.startswith("input_bn/"):
        return _lookup(_bn_rules("input_layer.1"), rel.split("/", 1)[1])
    if rel == "input_prelu/alpha":
        return ("input_layer.2.weight", _identity)
    m = re.match(r"body_(\d+)/(.+)", rel)
    if m:
        return _lookup(_bottleneck_ir_rules(f"body.{int(m.group(1))}", se=True), m.group(2))
    if rel.startswith("output_bn/"):
        return _lookup(_bn_rules("output_layer.0"), rel.split("/", 1)[1])
    if rel == "output_weight":
        return ("output_layer.3.weight", _identity)
    if rel == "output_bias":
        return ("output_layer.3.bias", _identity)
    table = {
        "output_bn1d/scale": ("output_layer.4.weight", _identity),
        "output_bn1d/bias": ("output_layer.4.bias", _identity),
        "output_bn1d/mean": ("output_layer.4.running_mean", _identity),
        "output_bn1d/var": ("output_layer.4.running_var", _identity),
    }
    return table.get(rel)


def lpips_path_to_torch(path: str) -> Rule | None:
    """LPIPS v0.1 alex sd (reference losses/lpips): torch names
    net.slice{1..5}.{idx}.weight for the AlexNet convs (torchvision indices
    0,3,6,8,10) and lin{i}.model.1.weight for the heads."""
    p = path.split("/")
    rel = "/".join(p[1:]) if p[0] in ("params", "batch_stats") else "/".join(p)
    # AlexNet conv taps: our conv{i} <-> torchvision features indices
    tv_idx = {0: (1, 0), 1: (2, 3), 2: (3, 6), 3: (4, 8), 4: (5, 10)}
    m = re.match(r"net/conv(\d)/conv/(kernel|bias)", rel)
    if m:
        i = int(m.group(1))
        slice_i, feat_i = tv_idx[i]
        suffix = "weight" if m.group(2) == "kernel" else "bias"
        tf = _conv_to_flax if suffix == "weight" else _identity
        return (f"net.slice{slice_i}.{feat_i}.{suffix}", tf)
    m = re.match(r"lin(\d)_weight", rel)
    if m:
        # torch lin weights are [1, C, 1, 1] like ours
        return (f"lin{m.group(1)}.model.1.weight", _identity)
    return None


def ingest_perceptual(variables: dict, torch_sd: dict, kind: str, strict: bool = True):
    """Fill an LPIPS or ArcFace (IDLoss) variables tree from its torch sd."""
    rule_fn = {"lpips": lpips_path_to_torch, "arcface": arcface_path_to_torch}[kind]
    flat = flatten_tree(variables)
    new_flat, missing = {}, []
    for path, value in flat.items():
        rule = rule_fn(path)
        if rule is None or rule[0] not in torch_sd:
            new_flat[path] = value
            missing.append(path)
            continue
        tk, tf = rule
        t = tf(torch_sd[tk])
        if tuple(t.shape) != tuple(np.shape(value)):
            raise ValueError(f"shape mismatch at {path}: {t.shape} vs {np.shape(value)}")
        new_flat[path] = t.astype(np.asarray(value).dtype)
    if strict and missing:
        raise KeyError(f"{len(missing)} unmapped perceptual params, e.g. {missing[:5]}")
    return unflatten_tree(new_flat), missing


def _hgfilter_rule(tp: str, sub: str) -> Rule | None:
    """HGFilter params (HGFilters.py:70-188 layout)."""
    if sub.startswith("conv1/"):
        return _lookup(_torchconv_rules(f"{tp}.conv1"), sub.split("/", 1)[1])
    if sub == "bn1/scale":
        return (f"{tp}.bn1.weight", _identity)
    if sub == "bn1/bias":
        return (f"{tp}.bn1.bias", _identity)
    m = re.match(r"(conv[234]|top_m_\d+)/(.+)", sub)
    if m:
        return _convblock_rule(f"{tp}.{m.group(1)}", m.group(2))
    m = re.match(r"m(\d+)/(b\d_(?:plus_)?\d+)/(.+)", sub)
    if m:
        return _convblock_rule(f"{tp}.m{m.group(1)}.{m.group(2)}", m.group(3))
    m = re.match(r"(conv_last|l|bl|al)(\d+)/(.+)", sub)
    if m:
        return _lookup(_torchconv_rules(f"{tp}.{m.group(1)}{m.group(2)}"), m.group(3))
    m = re.match(r"bn_end(\d+)/(scale|bias)", sub)
    if m:
        suffix = "weight" if m.group(2) == "scale" else "bias"
        return (f"{tp}.bn_end{m.group(1)}.{suffix}", _identity)
    return None


def _convblock_rule(tp: str, sub: str) -> Rule | None:
    """PIFu ConvBlock (net_util.py:399-453)."""
    m = re.match(r"conv([123])/(.+)", sub)
    if m:
        return _lookup(_torchconv_rules(f"{tp}.conv{m.group(1)}"), m.group(2))
    m = re.match(r"bn([1234])/(scale|bias)", sub)
    if m:
        suffix = "weight" if m.group(2) == "scale" else "bias"
        return (f"{tp}.bn{m.group(1)}.{suffix}", _identity)
    if sub.startswith("downsample_conv/"):
        return _lookup(_torchconv_rules(f"{tp}.downsample.2"), sub.split("/", 1)[1])
    return None


# ------------------------------------------------------------------ ingestion


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = tree
    return out


def unflatten_tree(flat: dict[str, Any]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def normalize_g_ema_keys(sd: dict[str, Any]) -> dict[str, Any]:
    """Undo the reference's netGlobal nesting and module. prefixes
    (train_setup.py:243-265): renderer.network.netGlobal.X -> renderer.network.X;
    netLocal keys are split out by ingest_variables."""
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        k = k.replace("renderer.network.netGlobal.", "renderer.network.")
        out[k] = v
    return out


def ingest_variables(
    variables: dict,
    torch_sds: dict[str, dict[str, Any]],
    strict: bool = True,
) -> tuple[dict, list[str]]:
    """Fill OUR variables from torch state dicts.

    torch_sds maps top-module name ('generator', 'encoder', 'local', 'grid_align',
    'fuse_sft_block', 'volume_discriminator') to its torch state_dict. netLocal keys
    inside the generator sd should be pre-split: keys starting with
    'renderer.network.netLocal.' go to 'local' with that prefix stripped.

    Returns (new_variables, missing_paths).
    """
    flat = flatten_tree(variables)
    new_flat = {}
    missing = []
    for path, value in flat.items():
        parts = path.split("/")
        top = parts[1]
        sd = torch_sds.get(top)
        rule = flax_path_to_torch(path) if sd is not None else None
        if rule is None:
            new_flat[path] = value
            if sd is not None:
                missing.append(path)
            continue
        torch_key, transform = rule
        if torch_key not in sd:
            new_flat[path] = value
            missing.append(f"{path} <- {torch_key} (absent)")
            continue
        t = transform(sd[torch_key])
        if tuple(t.shape) != tuple(np.shape(value)):
            raise ValueError(f"shape mismatch at {path}: torch {t.shape} vs ours {np.shape(value)}")
        new_flat[path] = t.astype(np.asarray(value).dtype)
    if strict and missing:
        raise KeyError(f"{len(missing)} unmapped params, e.g. {missing[:10]}")
    return unflatten_tree(new_flat), missing


def split_generator_sd(g_ema_sd: dict[str, Any]) -> tuple[dict, dict]:
    """Split a (normalized) StyleSDF/E3DGE generator sd into (generator, netLocal)."""
    gen, local = {}, {}
    for k, v in g_ema_sd.items():
        if k.startswith("renderer.network.netLocal."):
            local[k[len("renderer.network.netLocal.") :]] = v
        else:
            gen[k] = v
    return gen, local


def _sd_to_numpy(sd: dict[str, Any]) -> dict[str, Any]:
    return {
        k.removeprefix("module."): v.detach().cpu().numpy()
        for k, v in sd.items()
        if hasattr(v, "detach")
    }


def load_torch_file(path: str) -> dict[str, Any]:
    """Load a .pt/.pth into numpy arrays (CPU torch required). A StyleSDF-style
    wrapper dict collapses to its 'g_ema' entry."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "g_ema" in ckpt:
        ckpt = ckpt["g_ema"]
    return _sd_to_numpy(ckpt)


def load_raw_ckpt(path: str) -> dict[str, Any]:
    """Load a .pt/.pth WITHOUT collapsing wrapper keys — for multi-network
    save_dicts (full E3DGE training checkpoints) and for pulling secondary
    entries like the StyleSDF 'd' (volume discriminator, the pose estimator —
    train_setup.py:139-141)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# reference network-dict names (base_runner.save_network:253-285 saves one
# state_dict per self.network entry) -> our ingest_variables top-module names.
# 'discriminator' (the full-res G1 D) lives in the training bundle, not in the
# E3DGE inference variables — load it via scripts/train.py --resume paths.
E3DGE_SAVE_DICT_TOPS = {
    "encoder": "encoder",                  # trainer.py:1684
    "netLocal": "local",                   # AERunner network dict
    "grid_align": "grid_align",            # e3dge_2dalignonly_runner.py:566
    "Fuse_sft_block": "fuse_sft_block",    # e3dge_full_runner.py:322
    "volume_discriminator": "volume_discriminator",
}


def split_e3dge_save_dict(ckpt: dict[str, Any]) -> dict[str, dict[str, Any]]:
    """A released E3DGE training checkpoint is a save_dict keyed by network name
    ('iter', 'encoder', 'netLocal', 'grid_align', 'Fuse_sft_block', optimizer
    states, ...). Map the inference-relevant entries to our ingest_variables
    tops as numpy state dicts."""
    out = {}
    for ref_name, our_top in E3DGE_SAVE_DICT_TOPS.items():
        sd = ckpt.get(ref_name)
        if isinstance(sd, dict) and sd:
            out[our_top] = _sd_to_numpy(sd)
    return out
