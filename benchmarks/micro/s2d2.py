"""Experiment 2: space-to-depth stem via u8 phase splits / direct-from-YUV.

The round-2 negative result (s2d.py) transposed a materialized bf16 RGB
input — the 6-D transpose cost more than the C_in=3 stem inefficiency it
removed. These variants move the phase split to places where it is (nearly)
free:

  A  current pipeline path: I420 -> u8 RGB -> f32/255 -> bf16 -> 6x6/s2 stem
  B  phases computed DIRECTLY from the YUV planes (chroma is natively at
     phase resolution -> the 2x2 jnp.repeat upsample disappears), u8 RGB
     still produced for the ReID crop source; 3x3/s1 stem on [.., 12]
  C  phases as strided slices of the u8 RGB crop source; 3x3/s1 stem
  D  phases via u8 reshape-transpose of the RGB crop source; 3x3/s1 stem

All variants also emit the u8 crop_source (the pipeline needs it for ReID),
so the comparison includes every byte the real program must produce.
Exactness of B/C/D vs A is asserted elementwise on the stem output (bf16 in,
f32 accum both ways; tap order differs -> tolerance 0 is NOT expected, use
allclose and report max diff).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from vehicle_counting_tpu.ops.letterbox import yuv420_to_rgb_u8


def stem_weights(rng):
    w = jnp.asarray(rng.standard_normal((6, 6, 3, 32)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.01, jnp.float32)
    return w, b


def to_w2(w):
    """[6,6,3,32] -> [3,3,12,32] phase-split weights (channel = (py*2+px)*3+c)."""
    w = np.asarray(w, np.float32)
    w2 = np.zeros((3, 3, 12, 32), np.float32)
    for u in range(6):
        a, py = divmod(u, 2)  # tap index a, phase py  (u-2 = 2(a-1)+py)
        for v in range(6):
            bb, px = divmod(v, 2)
            w2[a, bb, (py * 2 + px) * 3 : (py * 2 + px) * 3 + 3, :] = w[u, v]
    return jnp.asarray(w2, jnp.bfloat16)


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def epilogue(y, b):
    y = y + b
    return jax.nn.silu(y).astype(jnp.bfloat16)


def split_yuv(yuv):
    b_, h15, w_ = yuv.shape
    h = h15 * 2 // 3
    y = yuv[:, :h, :]
    u = yuv[:, h : h + h // 4, :].reshape(b_, h // 2, w_ // 2)
    v = yuv[:, h + h // 4 :, :].reshape(b_, h // 2, w_ // 2)
    return y, u, v


def phases_from_yuv(yuv):
    """[B,320,320,12] u8 == strided phase slices of yuv420_to_rgb_u8(yuv).

    Chroma planes are already at phase resolution, so no upsample happens;
    each Y phase is one strided slice of the u8 Y plane. Channel order
    (py*2+px)*3 + rgb.
    """
    yp, up, vp = split_yuv(yuv)
    uf = up.astype(jnp.float32) - 128.0
    vf = vp.astype(jnp.float32) - 128.0
    chans = []
    for py in range(2):
        for px in range(2):
            yf = (yp[:, py::2, px::2].astype(jnp.float32) - 16.0) * 1.163999557
            r = jnp.clip(yf + 1.596026612 * vf, 0.0, 255.0).astype(jnp.uint8)
            g = jnp.clip(
                yf - 0.391762290 * uf - 0.812967647 * vf, 0.0, 255.0
            ).astype(jnp.uint8)
            bl = jnp.clip(yf + 2.017232143 * uf, 0.0, 255.0).astype(jnp.uint8)
            chans += [r, g, bl]
    return jnp.stack(chans, axis=-1)


def main():
    B = 128
    rng = np.random.default_rng(0)
    yuv = jnp.asarray(
        rng.integers(0, 256, size=(B, 960, 640), dtype=np.uint8)
    )  # full-frame I420 at 640x640
    w, bias = stem_weights(rng)
    w2 = to_w2(w)

    @jax.jit
    def path_a(yuv, w, bias):
        crop_source = yuv420_to_rgb_u8(yuv)
        imgs = (crop_source.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        return crop_source, epilogue(conv(imgs, w, 2, 2), bias)

    @jax.jit
    def path_b(yuv, w2, bias):
        crop_source = yuv420_to_rgb_u8(yuv)
        ph = phases_from_yuv(yuv)
        imgs = (ph.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        return crop_source, epilogue(conv(imgs, w2, 1, 1), bias)

    @jax.jit
    def path_c(yuv, w2, bias):
        crop_source = yuv420_to_rgb_u8(yuv)
        ph = jnp.concatenate(
            [
                crop_source[:, py::2, px::2, :]
                for py in range(2)
                for px in range(2)
            ],
            axis=-1,
        )
        imgs = (ph.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        return crop_source, epilogue(conv(imgs, w2, 1, 1), bias)

    @jax.jit
    def path_d(yuv, w2, bias):
        crop_source = yuv420_to_rgb_u8(yuv)
        b_, h, wd, c = crop_source.shape
        ph = crop_source.reshape(b_, h // 2, 2, wd // 2, 2, c)
        ph = ph.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // 2, wd // 2, 4 * c)
        imgs = (ph.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        return crop_source, epilogue(conv(imgs, w2, 1, 1), bias)

    # ---- correctness ----
    cs_a, out_a = path_a(yuv, w, bias)
    for name, f, warg in (("B", path_b, w2), ("C", path_c, w2), ("D", path_d, w2)):
        cs, out = f(yuv, warg, bias)
        assert np.array_equal(np.asarray(cs), np.asarray(cs_a)), name
        d = np.max(
            np.abs(np.asarray(out, np.float32) - np.asarray(out_a, np.float32))
        )
        print(f"{name}: crop_source equal, stem max|diff| = {d:.6f}")
        # NOTE path D's channel order must match w2's (py,px) order: the
        # reshape-transpose yields (py, px) fastest-varying px -> same order.

    # ---- timing ----
    def bench(f, *args):
        out = f(*args)
        np.asarray(out[1][:1, :1, :1])
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(*args)
            np.asarray(out[1][:1, :1, :1])
            best = min(best, time.perf_counter() - t0)
        return best / 8 / B * 1e6

    print(f"A  direct 6x6/s2 from u8 RGB : {bench(path_a, yuv, w, bias):8.1f} us/frame")
    print(f"B  s2d from YUV phases       : {bench(path_b, yuv, w2, bias):8.1f} us/frame")
    print(f"C  s2d u8 strided slices     : {bench(path_c, yuv, w2, bias):8.1f} us/frame")
    print(f"D  s2d u8 reshape-transpose  : {bench(path_d, yuv, w2, bias):8.1f} us/frame")


if __name__ == "__main__":
    main()
