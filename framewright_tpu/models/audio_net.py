"""Learned spectral-mask audio enhancement net (DeepFilterNet-class).

The reference ships DeepFilterNet3 as its learned audio path
(reference processors/audio_deepfilter/deepfilter.py:225-787: STFT ->
ERB features -> GRU encoder -> per-band gains -> iSTFT). This is the
TPU-native equivalent: a compact conv + GRU mask-estimation network in
pure JAX over the same ERB band-power features the WienerMaskDenoiser
(audio.py) computes, trained on synthetic noise mixtures with an
ideal-ratio-mask target. It plugs into WienerMaskDenoiser via its
``mask_fn`` hook and is selected with
AudioEnhanceConfig(denoise_model="ai").

Training is self-contained (no external data): clean signals are
synthetic harmonic/AM "speech-like" tracks; noise is white/pink/hum
mixtures at random SNRs. A small pretrained checkpoint ships in the
repo (models/weights/audio_mask_v1.npz) so the `ai` backend works out
of the box; ``train_mask_net`` reproduces it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

BANDS = 32
HIDDEN = 48
CONV_W = 5  # temporal conv width


# ---------------------------------------------------------------------------
# Model: feature conv -> GRU over time -> per-band sigmoid gains
# ---------------------------------------------------------------------------

def init_params(seed: int = 0) -> Dict:
    rng = np.random.default_rng(seed)

    def glorot(*shape):
        fan = (shape[0] + shape[-1]) / 2.0
        return (rng.standard_normal(shape) / np.sqrt(fan)).astype(np.float32)

    return {
        # temporal conv over band features: (W, BANDS, HIDDEN)
        "conv_w": glorot(CONV_W, BANDS, HIDDEN),
        "conv_b": np.zeros(HIDDEN, np.float32),
        # GRU: gates z, r, h
        "gru_wi": glorot(HIDDEN, 3 * HIDDEN),
        "gru_wh": glorot(HIDDEN, 3 * HIDDEN),
        "gru_b": np.zeros(3 * HIDDEN, np.float32),
        # output head
        "out_w": glorot(HIDDEN, BANDS),
        "out_b": np.zeros(BANDS, np.float32),
    }


def _features(band_pow):
    """Log-power features, per-utterance normalized."""
    import jax.numpy as jnp

    f = jnp.log10(band_pow + 1e-10)
    mu = jnp.mean(f, axis=-2, keepdims=True)
    sd = jnp.std(f, axis=-2, keepdims=True) + 1e-3
    return (f - mu) / sd


def apply(params: Dict, band_pow) -> "jnp.ndarray":
    """band_pow (T, BANDS) -> gains (T, BANDS) in (0, 1)."""
    import jax
    import jax.numpy as jnp

    f = _features(band_pow)                      # (T, B)
    t = f.shape[0]
    # temporal conv (causal-ish: centered, zero-padded)
    pad = CONV_W // 2
    fp = jnp.pad(f, ((pad, pad), (0, 0)))
    w = jnp.asarray(params["conv_w"])
    h = sum(fp[i:i + t] @ w[i] for i in range(CONV_W))
    h = jax.nn.relu(h + jnp.asarray(params["conv_b"]))

    wi = jnp.asarray(params["gru_wi"])
    wh = jnp.asarray(params["gru_wh"])
    b = jnp.asarray(params["gru_b"])
    nh = HIDDEN

    def gru_step(state, x):
        gi = x @ wi + b
        gh = state @ wh
        z = jax.nn.sigmoid(gi[:nh] + gh[:nh])
        r = jax.nn.sigmoid(gi[nh:2 * nh] + gh[nh:2 * nh])
        n = jnp.tanh(gi[2 * nh:] + r * gh[2 * nh:])
        new = (1 - z) * n + z * state
        return new, new

    _, hs = jax.lax.scan(gru_step, jnp.zeros(nh, jnp.float32), h)
    gains = jax.nn.sigmoid(hs @ jnp.asarray(params["out_w"])
                           + jnp.asarray(params["out_b"]))
    return gains


# ---------------------------------------------------------------------------
# Synthetic training data (no external corpora; reference trains on
# DNS-challenge data — here the degradation model IS the spec)
# ---------------------------------------------------------------------------

def synth_clean(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    """Speech-like synthetic clean audio: gliding harmonic stacks with
    AM envelopes and pauses."""
    t = np.arange(n) / sr
    x = np.zeros(n, np.float32)
    n_seg = max(1, n // (sr // 2))
    for _ in range(n_seg):
        f0 = rng.uniform(90, 280)
        glide = rng.uniform(-30, 30)
        start = rng.integers(0, max(1, n - sr // 4))
        dur = int(rng.uniform(0.15, 0.5) * sr)
        seg = slice(start, min(n, start + dur))
        ts = t[seg] - t[seg][0] if seg.stop > seg.start else t[seg]
        env = np.hanning(len(ts)) * rng.uniform(0.3, 1.0)
        partial = np.zeros(len(ts), np.float32)
        for k in range(1, 6):
            a = 1.0 / k ** rng.uniform(0.8, 1.5)
            partial += a * np.sin(
                2 * np.pi * (f0 + glide * ts) * k * ts
                + rng.uniform(0, 2 * np.pi))
        x[seg] += (env * partial).astype(np.float32)
    peak = np.abs(x).max() + 1e-6
    return 0.5 * x / peak


def synth_noise(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    """White/pink/hum noise mixture."""
    white = rng.standard_normal(n).astype(np.float32)
    spec = np.fft.rfft(rng.standard_normal(n))
    freq = np.maximum(np.fft.rfftfreq(n, 1 / sr), 1.0)
    pink = np.fft.irfft(spec / np.sqrt(freq), n=n).astype(np.float32)
    pink /= np.abs(pink).max() + 1e-6
    hum = np.zeros(n, np.float32)
    if rng.random() < 0.5:
        base = rng.choice([50.0, 60.0])
        t = np.arange(n) / sr
        for k in range(1, 4):
            hum += np.sin(2 * np.pi * base * k * t).astype(np.float32) / k
        hum *= 0.3
    w = rng.dirichlet([1.0, 1.0, 0.5])
    mix = w[0] * white / 3.0 + w[1] * pink + w[2] * hum
    return mix.astype(np.float32)


def _band_matrix(n_bins: int, bands: int = BANDS) -> np.ndarray:
    from framewright_tpu.audio import WienerMaskDenoiser

    return WienerMaskDenoiser(bands=bands)._band_matrix(n_bins)


def make_batch(rng: np.random.Generator, sr: int = 48000,
               seconds: float = 1.5, frame: int = 960, hop: int = 480
               ) -> Tuple[np.ndarray, np.ndarray]:
    """One training example: (noisy band power (T, B), IRM target (T, B))."""
    n = int(sr * seconds)
    clean = synth_clean(rng, n, sr)
    noise = synth_noise(rng, n, sr)
    snr_db = rng.uniform(-5, 20)
    cp = np.sqrt(np.mean(clean ** 2)) + 1e-9
    npow = np.sqrt(np.mean(noise ** 2)) + 1e-9
    noise = noise * (cp / npow) * 10 ** (-snr_db / 20)

    win = np.hanning(frame).astype(np.float32)
    n_frames = (n - frame) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    cs = np.abs(np.fft.rfft(clean[idx] * win, axis=1)) ** 2
    ns = np.abs(np.fft.rfft(noise[idx] * win, axis=1)) ** 2
    mix = np.abs(np.fft.rfft((clean + noise)[idx] * win, axis=1)) ** 2
    bm = _band_matrix(cs.shape[1]).T  # (bins, B)
    cb, nb, mb = cs @ bm, ns @ bm, mix @ bm
    irm = np.sqrt(cb / np.maximum(cb + nb, 1e-12)).astype(np.float32)
    return mb.astype(np.float32), irm


def synth_music(rng: np.random.Generator, n: int, sr: int) -> np.ndarray:
    """Music-like background: sustained chord stacks with slow attacks
    and light vibrato — spectrally rich but temporally stationary (the
    property the separator's modulation gate exploits)."""
    t = np.arange(n) / sr
    x = np.zeros(n, np.float32)
    roots = rng.choice([110.0, 130.8, 146.8, 164.8], size=2, replace=False)
    for root in roots:
        for ratio in (1.0, 1.25, 1.5, 2.0):
            f = root * ratio * rng.uniform(0.998, 1.002)
            vib = 1.0 + 0.002 * np.sin(2 * np.pi * rng.uniform(4, 6) * t)
            amp = rng.uniform(0.1, 0.3) / ratio
            x += (amp * np.sin(2 * np.pi * f * vib * t
                               + rng.uniform(0, 2 * np.pi))).astype(np.float32)
    # slow swell so it is not perfectly constant
    swell = 0.8 + 0.2 * np.sin(2 * np.pi * rng.uniform(0.05, 0.2) * t)
    x *= swell.astype(np.float32)
    peak = np.abs(x).max() + 1e-6
    return 0.5 * x / peak


def make_batch_sep(rng: np.random.Generator, sr: int = 48000,
                   seconds: float = 1.5, frame: int = 960, hop: int = 480
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Separation example: (mixture band power (T, B), vocals IRM)."""
    n = int(sr * seconds)
    voc = synth_clean(rng, n, sr)
    mus = synth_music(rng, n, sr)
    smr_db = rng.uniform(-6, 12)          # speech-to-music ratio
    vp = np.sqrt(np.mean(voc ** 2)) + 1e-9
    mp = np.sqrt(np.mean(mus ** 2)) + 1e-9
    mus = mus * (vp / mp) * 10 ** (-smr_db / 20)

    win = np.hanning(frame).astype(np.float32)
    n_frames = (n - frame) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    vs = np.abs(np.fft.rfft(voc[idx] * win, axis=1)) ** 2
    ms = np.abs(np.fft.rfft(mus[idx] * win, axis=1)) ** 2
    mix = np.abs(np.fft.rfft((voc + mus)[idx] * win, axis=1)) ** 2
    bm = _band_matrix(vs.shape[1]).T
    vb, mb, xb = vs @ bm, ms @ bm, mix @ bm
    irm = np.sqrt(vb / np.maximum(vb + mb, 1e-12)).astype(np.float32)
    return xb.astype(np.float32), irm


# ---------------------------------------------------------------------------
# Training (plain JAX + manual Adam — small enough not to need optax)
# ---------------------------------------------------------------------------

def train_mask_net(steps: int = 300, seed: int = 0, lr: float = 2e-3,
                   log_every: int = 0) -> Dict:
    import jax
    import jax.numpy as jnp

    params = init_params(seed)
    rng = np.random.default_rng(seed + 1)

    def loss_fn(p, x, y):
        g = apply(p, x)
        # weight active-speech frames higher (band energy above median)
        w = 1.0 + (y > 0.5)
        return jnp.mean(w * (g - y) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v = {k: np.zeros_like(vv) for k, vv in params.items()}
    for step in range(1, steps + 1):
        x, y = make_batch(rng)
        loss, g = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        for k in params:
            gk = np.asarray(g[k])
            m[k] = 0.9 * m[k] + 0.1 * gk
            v[k] = 0.999 * v[k] + 0.001 * gk * gk
            mh = m[k] / (1 - 0.9 ** step)
            vh = v[k] / (1 - 0.999 ** step)
            params[k] = (params[k] - lr * mh / (np.sqrt(vh) + 1e-8)
                         ).astype(np.float32)
        if log_every and step % log_every == 0:
            print(f"step {step}: loss {float(loss):.4f}")
    return params


def train_separator(steps: int = 400, seed: int = 0, lr: float = 2e-3,
                    log_every: int = 0) -> Dict:
    """Multi-target variant: same conv-GRU trunk, trained to predict
    the VOCALS band mask on speech+music mixtures (the background mask
    is its complement). Checkpoint: audio_sep_v1.npz."""
    import jax
    import jax.numpy as jnp

    params = init_params(seed + 100)
    rng = np.random.default_rng(seed + 101)

    def loss_fn(p, x, y):
        g = apply(p, x)
        return jnp.mean((g - y) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v = {k: np.zeros_like(vv) for k, vv in params.items()}
    for step in range(1, steps + 1):
        x, y = make_batch_sep(rng)
        loss, g = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        for k in params:
            gk = np.asarray(g[k])
            m[k] = 0.9 * m[k] + 0.1 * gk
            v[k] = 0.999 * v[k] + 0.001 * gk * gk
            mh = m[k] / (1 - 0.9 ** step)
            vh = v[k] / (1 - 0.999 ** step)
            params[k] = (params[k] - lr * mh / (np.sqrt(vh) + 1e-8)
                         ).astype(np.float32)
        if log_every and step % log_every == 0:
            print(f"sep step {step}: loss {float(loss):.4f}")
    return params


# ---------------------------------------------------------------------------
# Checkpoint I/O + the mask_fn adapter
# ---------------------------------------------------------------------------

_DEFAULT_CKPT = Path(__file__).parent / "weights" / "audio_mask_v1.npz"
_SEP_CKPT = Path(__file__).parent / "weights" / "audio_sep_v1.npz"


def make_sep_mask_fn(path: Optional[Path] = None):
    """-> fn(band_pow (T, B)) -> vocals band gains, from the separator
    checkpoint (FileNotFoundError when it is absent)."""
    import jax
    import jax.numpy as jnp

    params = load_params(path or _SEP_CKPT)
    fwd = jax.jit(lambda x: apply(params, x))

    def mask_fn(band_pow: np.ndarray) -> np.ndarray:
        return np.asarray(fwd(jnp.asarray(band_pow, jnp.float32)))

    return mask_fn


def save_params(params: Dict, path: Path = _DEFAULT_CKPT) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **params)
    return path


def load_params(path: Optional[Path] = None) -> Dict:
    path = Path(path or _DEFAULT_CKPT)
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def make_mask_fn(params: Optional[Dict] = None):
    """-> mask_fn(band_pow (T, B) numpy) -> gains, for
    WienerMaskDenoiser(mask_fn=...)."""
    import jax
    import jax.numpy as jnp

    if params is None:
        params = load_params()
    fwd = jax.jit(lambda x: apply(params, x))

    def mask_fn(band_pow: np.ndarray) -> np.ndarray:
        return np.asarray(fwd(jnp.asarray(band_pow, jnp.float32)))

    return mask_fn
