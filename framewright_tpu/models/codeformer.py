"""CodeFormer: codebook-lookup transformer face restoration in JAX.

TPU-native build of the reference's CodeFormer backend
(reference processors/restoration/faces.py:337 ``CodeFormerBackend``,
utils/model_manager.py:161 downloads sczhou/CodeFormer codeformer.pth).
Follows the published architecture (arXiv:2206.11253, sczhou/CodeFormer
``vqgan_arch.py`` + ``codeformer_arch.py``):

- VQGAN encoder 512->16 px (nf=64, ch_mult 1,2,2,4,4,8, 2 res blocks
  per scale, self-attention at 16 px), 256-d latent;
- 1024-entry learned codebook; a 9-layer 512-d pre-norm transformer
  predicts code indices from the low-quality latent (the "codebook
  lookup" that replaces nearest-neighbour quantization for degraded
  inputs) — sequence length is a static 256 tokens, attention is plain
  batched matmul softmax (MXU-friendly, no KV cache needed);
- VQGAN generator with controllable feature transformation (CFT)
  fusion from encoder skips at 32/64/128/256 px, fidelity weight
  ``w`` in [0, 1] blending quality (w=0) vs fidelity (w=1).

Weight port: sczhou state-dict naming (``encoder.blocks.N.*``,
``generator.blocks.N.*``, ``quantize.embedding.weight``,
``position_emb``, ``feat_emb.*``, ``ft_layers.N.*``,
``idx_pred_layer.*``, ``fuse_convs_dict.<res>.*``) via
``torch_port.port_codeformer``; block numbering is reproduced by the
same construction walk (``_encoder_plan`` / ``_generator_plan``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from framewright_tpu.models.layers import conv_init, conv2d, upsample_nearest


@dataclass(frozen=True)
class CodeFormerConfig:
    img_size: int = 512
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    res_blocks: int = 2
    attn_resolution: int = 16
    emb_dim: int = 256
    codebook_size: int = 1024
    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    connect: Tuple[int, ...] = (32, 64, 128, 256)

    @property
    def latent_size(self) -> int:
        return self.img_size // 2 ** (len(self.ch_mult) - 1)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gn_init(ch: int) -> Dict:
    return {"g": jnp.ones((ch,), jnp.float32),
            "b": jnp.zeros((ch,), jnp.float32)}


def _group_norm(p: Dict, x: jnp.ndarray, groups: int = 32,
                eps: float = 1e-6) -> jnp.ndarray:
    b, h, w, c = x.shape
    groups = min(groups, c)         # tiny test configs: <32 channels
    xg = x.reshape(b, h, w, groups, c // groups)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, h, w, c)
    return x * p["g"].astype(x.dtype) + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# VQGAN blocks
# ---------------------------------------------------------------------------

def _resblock_init(key, cin: int, cout: int) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _gn_init(cin),
         "conv1": conv_init(k1, 3, cin, cout),
         "norm2": _gn_init(cout),
         "conv2": conv_init(k2, 3, cout, cout)}
    if cin != cout:
        p["conv_out"] = conv_init(k3, 1, cin, cout)
    return p


def _resblock(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = conv2d(p["conv1"], _swish(_group_norm(p["norm1"], x)))
    y = conv2d(p["conv2"], _swish(_group_norm(p["norm2"], y)))
    if "conv_out" in p:
        x = conv2d(p["conv_out"], x)
    return x + y


def _attn_init(key, ch: int) -> Dict:
    ks = jax.random.split(key, 4)
    return {"norm": _gn_init(ch),
            "q": conv_init(ks[0], 1, ch, ch),
            "k": conv_init(ks[1], 1, ch, ch),
            "v": conv_init(ks[2], 1, ch, ch),
            "proj": conv_init(ks[3], 1, ch, ch)}


def _attnblock(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    hn = _group_norm(p["norm"], x)
    q = conv2d(p["q"], hn).reshape(b, h * w, c)
    k = conv2d(p["k"], hn).reshape(b, h * w, c)
    v = conv2d(p["v"], hn).reshape(b, h * w, c)
    att = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32)
        / jnp.sqrt(jnp.float32(c)), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", att, v).reshape(b, h, w, c)
    return x + conv2d(p["proj"], out)


def _encoder_plan(cfg: CodeFormerConfig) -> List[Tuple[str, int, int, int]]:
    """(kind, cin, cout, resolution) per block, mirroring
    vqgan_arch.Encoder's construction order (port numbering relies on
    this walk)."""
    plan: List[Tuple[str, int, int, int]] = []
    res = cfg.img_size
    in_mult = (1,) + tuple(cfg.ch_mult)
    plan.append(("conv_in", 3, cfg.nf, res))
    for i in range(len(cfg.ch_mult)):
        cin = cfg.nf * in_mult[i]
        cout = cfg.nf * cfg.ch_mult[i]
        for _ in range(cfg.res_blocks):
            plan.append(("res", cin, cout, res))
            cin = cout
            if res == cfg.attn_resolution:
                plan.append(("attn", cout, cout, res))
        if i != len(cfg.ch_mult) - 1:
            plan.append(("down", cout, cout, res // 2))
            res //= 2
    c = cfg.nf * cfg.ch_mult[-1]
    plan += [("res", c, c, res), ("attn", c, c, res), ("res", c, c, res),
             ("norm", c, c, res), ("conv_out", c, cfg.emb_dim, res)]
    return plan


def _generator_plan(cfg: CodeFormerConfig):
    """(kind, cin, cout, res, fuse) per block. ``fuse`` marks the
    first res block at each upsampled resolution — codeformer's CFT
    fusion points (codeformer_arch fuse_generator_block: '32':9,
    '64':12, '128':15, '256':18 for the default plan)."""
    plan = []
    res = cfg.latent_size
    c = cfg.nf * cfg.ch_mult[-1]
    plan.append(("conv_in", cfg.emb_dim, c, res, False))
    plan += [("res", c, c, res, False), ("attn", c, c, res, False),
             ("res", c, c, res, False)]
    for i in reversed(range(len(cfg.ch_mult))):
        cout = cfg.nf * cfg.ch_mult[i]
        for j in range(cfg.res_blocks):
            fuse = (j == 0 and i != len(cfg.ch_mult) - 1)
            plan.append(("res", c, cout, res, fuse))
            c = cout
            if res == cfg.attn_resolution:
                plan.append(("attn", c, c, res, False))
        if i != 0:
            plan.append(("up", c, c, res * 2, False))
            res *= 2
    plan += [("norm", c, c, res, False), ("conv_out", c, 3, res, False)]
    return plan


def _blocks_init(key, plan) -> List[Dict]:
    blocks = []
    keys = jax.random.split(key, len(plan))
    for k, entry in zip(keys, plan):
        kind, cin, cout = entry[0], entry[1], entry[2]
        if kind in ("conv_in", "conv_out"):
            blocks.append({"conv": conv_init(k, 3, cin, cout)})
        elif kind == "res":
            blocks.append(_resblock_init(k, cin, cout))
        elif kind == "attn":
            blocks.append(_attn_init(k, cin))
        elif kind == "down":
            blocks.append({"conv": conv_init(k, 3, cin, cout)})
        elif kind == "up":
            blocks.append({"conv": conv_init(k, 3, cin, cout)})
        elif kind == "norm":
            blocks.append({"norm": _gn_init(cin)})
    return blocks


def _run_block(kind: str, p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    if kind in ("conv_in", "conv_out"):
        return conv2d(p["conv"], x)
    if kind == "res":
        return _resblock(p, x)
    if kind == "attn":
        return _attnblock(p, x)
    if kind == "down":
        # torch: asymmetric pad (0,1,0,1) + stride-2 VALID conv
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv2d({"w": p["conv"]["w"], "b": p["conv"]["b"]}, xp,
                      stride=2, padding="VALID")
    if kind == "up":
        return conv2d(p["conv"], upsample_nearest(x, 2))
    if kind == "norm":
        return _swish(_group_norm(p["norm"], x))
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# Transformer (code index prediction)
# ---------------------------------------------------------------------------

def _linear_init(key, cin, cout, bias=True) -> Dict:
    wkey, bkey = jax.random.split(key)
    lim = (1.0 / cin) ** 0.5
    p = {"w": jax.random.uniform(wkey, (cin, cout), jnp.float32, -lim, lim)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (cout,), jnp.float32, -lim, lim)
    return p


def _linear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln(p: Dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"].astype(x.dtype) \
        + p["b"].astype(x.dtype)


def _tf_layer_init(key, cfg: CodeFormerConfig) -> Dict:
    d, mlp = cfg.dim_embd, cfg.dim_embd * 2
    ks = jax.random.split(key, 4)
    return {
        "norm1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "norm2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "qkv": _linear_init(ks[0], d, 3 * d),
        "proj": _linear_init(ks[1], d, d),
        "fc1": _linear_init(ks[2], d, mlp),
        "fc2": _linear_init(ks[3], mlp, d),
    }


def _tf_layer(p: Dict, x: jnp.ndarray, pos: jnp.ndarray,
              n_head: int) -> jnp.ndarray:
    """Pre-norm self-attention layer (codeformer_arch.TransformerSALayer:
    query_pos added to q/k only, not v)."""
    b, n, d = x.shape
    h = _ln(p["norm1"], x)
    qkv_w = p["qkv"]["w"].astype(x.dtype)
    qkv_b = p["qkv"]["b"].astype(x.dtype)
    q = (h + pos) @ qkv_w[:, :d] + qkv_b[:d]
    k = (h + pos) @ qkv_w[:, d:2 * d] + qkv_b[d:2 * d]
    v = h @ qkv_w[:, 2 * d:] + qkv_b[2 * d:]
    dh = d // n_head

    def split(t):
        return t.reshape(b, n, n_head, dh).transpose(0, 2, 1, 3)

    att = jax.nn.softmax(
        jnp.einsum("bhqc,bhkc->bhqk", split(q), split(k),
                   preferred_element_type=jnp.float32)
        / jnp.sqrt(jnp.float32(dh)), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", att, split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
    x = x + _linear(p["proj"], out)
    h = _ln(p["norm2"], x)
    return x + _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], h),
                                             approximate=False))


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def init(key, cfg: CodeFormerConfig = CodeFormerConfig(),
         dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 8)
    n_tokens = cfg.latent_size ** 2
    channels = {res: cfg.nf * cfg.ch_mult[i]
                for i, res in enumerate(
                    cfg.img_size // 2 ** i for i in range(len(cfg.ch_mult)))}
    params = {
        "encoder": _blocks_init(keys[0], _encoder_plan(cfg)),
        "generator": _blocks_init(keys[1], _generator_plan(cfg)),
        "codebook": jax.random.normal(
            keys[2], (cfg.codebook_size, cfg.emb_dim)) * 0.02,
        "position_emb": jnp.zeros((n_tokens, cfg.dim_embd)),
        "feat_emb": _linear_init(keys[3], cfg.emb_dim, cfg.dim_embd),
        "ft_layers": [_tf_layer_init(k, cfg)
                      for k in jax.random.split(keys[4], cfg.n_layers)],
        "idx_norm": {"g": jnp.ones((cfg.dim_embd,)),
                     "b": jnp.zeros((cfg.dim_embd,))},
        "idx_pred": _linear_init(keys[5], cfg.dim_embd,
                                 cfg.codebook_size, bias=False),
        "fuse": {},
    }
    fuse_keys = jax.random.split(keys[6], len(cfg.connect))
    for k, res in zip(fuse_keys, cfg.connect):
        ch = channels[res]
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        params["fuse"][str(res)] = {
            "encode_enc": _resblock_init(k1, 2 * ch, ch),
            "scale1": conv_init(k2, 3, ch, ch),
            "scale2": conv_init(k3, 3, ch, ch),
            "shift1": conv_init(k4, 3, ch, ch),
            "shift2": conv_init(k5, 3, ch, ch),
        }
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(lambda v: v.astype(dtype), params)
    return params


def _lrelu02(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _fuse_sft(p: Dict, enc_feat: jnp.ndarray, dec_feat: jnp.ndarray,
              w: jnp.ndarray) -> jnp.ndarray:
    enc = _resblock(p["encode_enc"],
                    jnp.concatenate([enc_feat, dec_feat], axis=-1))
    scale = conv2d(p["scale2"], _lrelu02(conv2d(p["scale1"], enc)))
    shift = conv2d(p["shift2"], _lrelu02(conv2d(p["shift1"], enc)))
    return dec_feat + w * (dec_feat * scale + shift)


def apply(params: Dict, x: jnp.ndarray,
          cfg: CodeFormerConfig = CodeFormerConfig(),
          w: float = 0.5) -> jnp.ndarray:
    """Restore aligned 512x512 face crops.

    x: (B, 512, 512, 3) in [0, 1]. Returns the restored crops in
    [0, 1]. ``w`` is the fidelity weight: 0 = full codebook quality
    prior, 1 = maximum input fidelity (reference faces.py:110).
    """
    b = x.shape[0]
    h = x * 2.0 - 1.0                      # codeformer normalizes to [-1,1]
    enc_feats = {}
    for p, (kind, _ci, _co, res) in zip(params["encoder"],
                                        _encoder_plan(cfg)):
        h = _run_block(kind, p, h)
        if res in cfg.connect:
            # keep overwriting: the LAST block output at each connect
            # resolution is the recorded skip (codeformer_arch
            # fuse_encoder_block indices land after the res blocks)
            enc_feats[res] = h

    lq_feat = h                            # (B, 16, 16, 256)
    n = cfg.latent_size ** 2
    tokens = _linear(params["feat_emb"], lq_feat.reshape(b, n, cfg.emb_dim))
    pos = params["position_emb"].astype(tokens.dtype)[None]
    for layer in params["ft_layers"]:
        tokens = _tf_layer(layer, tokens, pos, cfg.n_head)
    logits = _linear(params["idx_pred"],
                     _ln(params["idx_norm"], tokens))   # (B, 256, 1024)
    idx = jnp.argmax(logits, axis=-1)
    quant = params["codebook"].astype(x.dtype)[idx]     # (B, 256, emb)
    h = quant.reshape(b, cfg.latent_size, cfg.latent_size, cfg.emb_dim)

    wj = jnp.asarray(w, x.dtype)
    for p, (kind, _ci, _co, res, fuse) in zip(params["generator"],
                                              _generator_plan(cfg)):
        h = _run_block(kind, p, h)
        if fuse and res in cfg.connect:
            h = _fuse_sft(params["fuse"][str(res)], enc_feats[res], h, wj)
    return jnp.clip((h + 1.0) * 0.5, 0.0, 1.0)


def encode_indices(params: Dict, x: jnp.ndarray,
                   cfg: CodeFormerConfig = CodeFormerConfig()) -> jnp.ndarray:
    """Nearest-codebook indices of the encoder latent (the plain VQGAN
    quantization path — used by tests and for codebook diagnostics)."""
    h = x * 2.0 - 1.0
    for p, entry in zip(params["encoder"], _encoder_plan(cfg)):
        h = _run_block(entry[0], p, h)
    b, lh, lw, c = h.shape
    flat = h.reshape(-1, c)
    book = params["codebook"].astype(h.dtype)
    d = (jnp.sum(flat ** 2, 1, keepdims=True)
         - 2.0 * flat @ book.T + jnp.sum(book ** 2, 1)[None])
    return jnp.argmin(d, axis=1).reshape(b, lh, lw)
