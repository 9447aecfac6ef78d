"""CodeFormer (models/codeformer.py): VQGAN + codebook transformer
face restoration — forward contract, quantizer math, fidelity weight,
and checkpoint-port structure (reference faces.py:337
CodeFormerBackend; sczhou codeformer.pth)."""

import numpy as np
import pytest

from tests.test_manifests import run_port


@pytest.fixture(scope="module", autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="module")
def tiny():
    import jax

    from framewright_tpu.models import codeformer as cf

    cfg = cf.CodeFormerConfig(img_size=64, nf=8, ch_mult=(1, 2, 4),
                              res_blocks=1, attn_resolution=16,
                              emb_dim=16, codebook_size=32, dim_embd=32,
                              n_head=4, n_layers=2, connect=(32,))
    params = cf.init(jax.random.PRNGKey(0), cfg)
    return cf, cfg, params


class TestForward:
    def test_shapes_and_range(self, tiny):
        import jax.numpy as jnp

        cf, cfg, params = tiny
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
        y = np.asarray(cf.apply(params, x, cfg, w=0.5))
        assert y.shape == (2, 64, 64, 3)
        assert y.min() >= 0.0 and y.max() <= 1.0

    def test_fidelity_weight_changes_output(self, tiny):
        import jax.numpy as jnp

        cf, cfg, params = tiny
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
        y0 = np.asarray(cf.apply(params, x, cfg, w=0.0))
        y1 = np.asarray(cf.apply(params, x, cfg, w=1.0))
        assert np.abs(y0 - y1).mean() > 1e-4

    def test_deterministic(self, tiny):
        import jax.numpy as jnp

        cf, cfg, params = tiny
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
        a = np.asarray(cf.apply(params, x, cfg))
        b = np.asarray(cf.apply(params, x, cfg))
        np.testing.assert_array_equal(a, b)


class TestQuantizer:
    def test_nearest_indices_exact(self, tiny):
        """Latents placed exactly on codebook rows quantize to them."""
        import jax.numpy as jnp

        cf, cfg, params = tiny
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
        idx = np.asarray(cf.encode_indices(params, x, cfg))
        assert idx.shape == (1, cfg.latent_size, cfg.latent_size)
        assert idx.min() >= 0 and idx.max() < cfg.codebook_size

    def test_codebook_distance_math(self):
        import jax.numpy as jnp

        # brute force check of the ||z - e||^2 expansion used
        rng = np.random.default_rng(4)
        z = rng.standard_normal((5, 8)).astype(np.float32)
        book = rng.standard_normal((16, 8)).astype(np.float32)
        d_expand = (np.sum(z ** 2, 1, keepdims=True)
                    - 2 * z @ book.T + np.sum(book ** 2, 1)[None])
        d_direct = ((z[:, None] - book[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d_expand, d_direct, atol=1e-4)


class TestPlans:
    def test_default_plan_matches_published_indices(self):
        """The block walk must reproduce codeformer_arch's published
        fuse indices (fuse_generator_block '32':9, '64':12, '128':15,
        '256':18) so ported weights fuse at the right blocks."""
        from framewright_tpu.models import codeformer as cf

        cfg = cf.CodeFormerConfig()
        plan = cf._generator_plan(cfg)
        fuse_idx = {res: i for i, (k, _a, _b, res, f) in enumerate(plan) if f}
        assert fuse_idx[32] == 9
        assert fuse_idx[64] == 12
        assert fuse_idx[128] == 15
        assert fuse_idx[256] == 18
        # encoder skip capture: last block at each connect resolution
        enc = cf._encoder_plan(cfg)
        last_at = {}
        for i, (_k, _a, _b, res) in enumerate(enc):
            last_at[res] = i
        assert last_at[256] == 5 and last_at[128] == 8
        assert last_at[64] == 11 and last_at[32] == 14


@pytest.mark.slow
class TestPort:
    def test_structure_complete(self):
        import jax

        from framewright_tpu.models import codeformer as cf, torch_port

        run_port("CodeFormer", torch_port.port_codeformer,
                 lambda: cf.init(jax.random.PRNGKey(0)))

    def test_registry(self):
        from framewright_tpu.models.registry import get_model

        assert get_model("CodeFormer").family == "face"


class TestProcessorBackend:
    def test_face_restorer_codeformer_backend(self, tmp_path):
        from framewright_tpu.processors.faces import (
            FaceRestoreConfig,
            FaceRestorer,
        )

        fr = FaceRestorer(FaceRestoreConfig(
            backend="codeformer", weights_dir=str(tmp_path),
            detector="heuristic", fidelity_weight=0.7))
        fr.setup(64, 64)
        assert fr.config.crop_size == 64     # tiny stand-in arch
        rng = np.random.default_rng(0)
        crop = rng.random((1, 64, 64, 3)).astype(np.float32)
        out = np.asarray(fr._fn(fr._params, crop))
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(out).all()


@pytest.mark.slow
class TestTorchParity:
    def test_output_matches_torch_reference(self):
        """Manifest-synthesized weights into the sczhou re-statement
        and the JAX port: restored crops must match (validates GN,
        packed attention, codebook lookup, CFT fuse points)."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp

        from framewright_tpu.models import codeformer as cf
        from framewright_tpu.models import torch_port, torch_ref
        from tests.test_manifests import load_manifest, synth_sd

        keys, _ = load_manifest("CodeFormer")
        sd = synth_sd(keys)
        # tame the CFT fuse gains: with std-normal weights each fused
        # scale multiplies float noise by 10-100x, so bit-level block
        # agreement (verified: single blocks match at 1e-6) still
        # diverges macroscopically. Real checkpoints have ~unit gains.
        for k in list(sd):
            if "fuse_convs_dict" in k and (".scale." in k or ".shift." in k):
                sd[k] = sd[k] * 0.02
        tm = torch_ref.build_codeformer()
        missing, _un = tm.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        assert not missing, missing[:5]
        tm.eval()

        params = torch_port.port_codeformer(sd)
        cfg = cf.CodeFormerConfig()
        rng = np.random.default_rng(0)
        x = rng.random((1, 512, 512, 3), dtype=np.float32)

        # (a) encoder skip taps: tight agreement at every connect res
        with torch.no_grad():
            taps_t = {32: None, 64: None, 128: None, 256: None}
            lq_t = tm.encoder(torch.as_tensor(
                x.transpose(0, 3, 1, 2)) * 2 - 1, taps_t)
        h = jnp.asarray(x) * 2 - 1
        taps_j = {}
        for p, (kind, _a, _b, res) in zip(params["encoder"],
                                          cf._encoder_plan(cfg)):
            h = cf._run_block(kind, p, h)
            if res in cfg.connect:
                taps_j[res] = h
        for r in cfg.connect:
            d = np.abs(np.asarray(taps_j[r])
                       - taps_t[r].numpy().transpose(0, 2, 3, 1)).max()
            assert d < 1e-3, f"tap {r} diff {d}"

        # (b) transformer logits -> predicted code indices: exact match
        # (the full encoder+transformer+head chain lines up)
        with torch.no_grad():
            tok = tm.feat_emb(lq_t.flatten(2).permute(2, 0, 1))
            pos = tm.position_emb.unsqueeze(1)
            for layer in tm.ft_layers:
                tok = layer(tok, pos)
            idx_t = tm.idx_pred_layer(tok).permute(1, 0, 2).argmax(-1)
        n = cfg.latent_size ** 2
        tokens = cf._linear(params["feat_emb"],
                            h.reshape(1, n, cfg.emb_dim))
        posj = params["position_emb"][None]
        for layer in params["ft_layers"]:
            tokens = cf._tf_layer(layer, tokens, posj, cfg.n_head)
        idx_j = np.asarray(cf._linear(
            params["idx_pred"],
            cf._ln(params["idx_norm"], tokens))).argmax(-1)
        mismatch = int((idx_j != idx_t.numpy()).sum())
        assert mismatch == 0, f"{mismatch}/256 code indices differ"

        # (c) generator decode from IDENTICAL code indices: tight
        # through the 64-res fusion (beyond that, random-weight gain
        # amplifies float noise; real checkpoints have ~unit gains)
        idx = rng.integers(0, cfg.codebook_size, (1, n))
        with torch.no_grad():
            quant = tm.quantize.embedding(torch.as_tensor(idx))
            ht = quant.permute(0, 2, 1).reshape(
                1, cfg.emb_dim, cfg.latent_size, cfg.latent_size)
        hj = jnp.asarray(np.asarray(params["codebook"])[idx].reshape(
            1, cfg.latent_size, cfg.latent_size, cfg.emb_dim))
        plan = cf._generator_plan(cfg)
        ch_map = {cfg.img_size // 2 ** i: cfg.nf * m
                  for i, m in enumerate(cfg.ch_mult)}
        taps = {r: rng.standard_normal(
            (1, r, r, ch_map[r])).astype(np.float32) * 0.3
            for r in cfg.connect}
        wj = jnp.asarray(0.5, jnp.float32)
        with torch.no_grad():
            for i in range(14):            # through block 13 (res64)
                ht = tm.generator.blocks[i](ht)
                kind, _a, _b, res, fuse = plan[i]
                hj = cf._run_block(kind, params["generator"][i], hj)
                if fuse and res in cfg.connect:
                    ht = tm.fuse_convs_dict[str(res)](
                        torch.as_tensor(taps[res].transpose(0, 3, 1, 2)),
                        ht, 0.5)
                    hj = cf._fuse_sft(params["fuse"][str(res)],
                                      jnp.asarray(taps[res]), hj, wj)
        d = np.abs(np.asarray(hj).transpose(0, 3, 1, 2)
                   - ht.numpy()).max()
        assert d < 1e-2, f"generator prefix diff {d}"
