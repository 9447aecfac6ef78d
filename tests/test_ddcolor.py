"""DDColor numeric parity vs the independent torch twin.

Round-2 VERDICT weak item 6: ``models/ddcolor.py`` mirrored official
dims but was never validated beyond shapes — a silent port bug would go
unnoticed (reference restoration/colorization.py:248-569 DDColorBackend
is the premier colorization path). This pins the full forward at
``large_config()`` dims against ``torch_ref.build_ddcolor``.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _conv_t(p):
    return {"weight": np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)),
            "bias": np.asarray(p["b"])}


def _lin_t(p):
    return {"weight": np.asarray(p["w"]).T, "bias": np.asarray(p["b"])}


def _ln_t(p):
    return {"weight": np.asarray(p["g"]), "bias": np.asarray(p["b"])}


@pytest.mark.slow
class TestDDColorTorchParity:
    def test_full_model_matches_twin_large_config(self):
        """Full-model forward parity at official DDColor dims: pins the
        ConvNeXt encoder (dwconv grouping, LN eps, layer scale), the FPN
        pixel decoder (bilinear half-pixel resize), the query
        cross-attention stack (head split, scale, residual/LN order),
        and the correlation-volume tanh head."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from framewright_tpu.models import ddcolor, torch_ref

        cfg = ddcolor.large_config()
        params = ddcolor.init(jax.random.PRNGKey(11), cfg)
        tm = torch_ref.build_ddcolor(
            dims=cfg.dims, depths=cfg.depths, num_queries=cfg.num_queries,
            embed_dim=cfg.embed_dim, pixel_dim=cfg.pixel_dim,
            heads=cfg.num_heads,
            dec_layers_per_scale=cfg.dec_layers_per_scale)

        sd = {}
        for k, v in _conv_t(params["stem"]).items():
            sd[f"stem.{k}"] = v
        for si, stage in enumerate(params["stages"]):
            for bi, blk in enumerate(stage):
                pre = f"stages.{si}.{bi}"
                for k, v in _conv_t(blk["dw"]).items():
                    sd[f"{pre}.dw.{k}"] = v
                for k, v in _ln_t(blk["ln"]).items():
                    sd[f"{pre}.ln.{k}"] = v
                for lk in ("fc1", "fc2"):
                    for k, v in _lin_t(blk[lk]).items():
                        sd[f"{pre}.{lk}.{k}"] = v
                sd[f"{pre}.gamma"] = np.asarray(blk["gamma"])
        for di, down in enumerate(params["downs"]):
            for k, v in _ln_t(down["ln"]).items():
                sd[f"downs.{di}.ln.{k}"] = v
            for k, v in _conv_t(down["conv"]).items():
                sd[f"downs.{di}.conv.{k}"] = v
        for li, lat in enumerate(params["lateral"]):
            for k, v in _conv_t(lat).items():
                sd[f"lateral.{li}.{k}"] = v
        for fi, fo in enumerate(params["fpn_out"]):
            for k, v in _conv_t(fo).items():
                sd[f"fpn_out.{fi}.{k}"] = v
        for k, v in _conv_t(params["pix_up"]).items():
            sd[f"pix_up.{k}"] = v
        sd["queries"] = np.asarray(params["queries"])
        for pi, fp in enumerate(params["feat_proj"]):
            for k, v in _lin_t(fp).items():
                sd[f"feat_proj.{pi}.{k}"] = v
        for di, dec in enumerate(params["dec"]):
            pre = f"dec.{di}"
            for lk in ("q", "k", "v", "o", "ffn1", "ffn2"):
                for k, v in _lin_t(dec[lk]).items():
                    sd[f"{pre}.{lk}.{k}"] = v
            for lk in ("ln1", "ln2"):
                for k, v in _ln_t(dec[lk]).items():
                    sd[f"{pre}.{lk}.{k}"] = v
        for k, v in _lin_t(params["q_final"]).items():
            sd[f"q_final.{k}"] = v
        for k, v in _conv_t(params["out"]).items():
            sd[f"out.{k}"] = v

        missing, unexpected = tm.load_state_dict(
            {k: torch.as_tensor(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=True)
        assert not missing and not unexpected
        tm.eval()

        rng = np.random.default_rng(17)
        l_channel = (rng.random((1, 64, 64, 1)) * 100.0).astype(np.float32)
        with torch.no_grad():
            yt = tm(torch.as_tensor(l_channel)).numpy()
        yj = np.asarray(ddcolor.apply(params, jnp.asarray(l_channel), cfg))
        assert yj.shape == yt.shape == (1, 64, 64, 2)
        scale = np.abs(yt).max() + 1e-6
        err = np.abs(yj - yt).max()
        assert err / scale < 2e-3, f"max abs err {err:.6f}"
