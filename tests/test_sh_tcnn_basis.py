"""Pin the SH direction-encoding basis against tcnn's enumerated one.

The active reference networks encode view directions with
``tcnn.Encoding(otype="SphericalHarmonics", degree=4)``
(``nerf/network_hash.py:55-61``), so an imported color net only renders
identically if our ``sh_encode`` produces the SAME 16 features in the SAME
order.  ``_tcnn_sh_deg4`` below is an independent transcription of tcnn's
``sh_enc`` kernel (tiny-cuda-nn ``include/tiny-cuda-nn/encodings/
spherical_harmonics.h``, public source; polynomials generated from the
recurrences in Sloan, "Stupid Spherical Harmonics Tricks", appendix A1) —
coefficients and expressions copied literally, NOT derived from our code.

Two facts being pinned:
  1. tcnn's basis equals the reference's pure-torch ``SHEncoder``
     (``hash_encoding.py:114-195``) on UNIT vectors: tcnn writes the pure-z²
     forms (e.g. ``0.9462*z² − 0.3154``) where torch-ngp writes the
     sphere-restricted forms (``0.3154*(2z² − x² − y²)``); with
     ``x² + y² + z² = 1`` they are identical.  Directions are normalized
     before encoding in every caller (ref ``network_hash.py:90``), so
     forward parity of an imported frozen color net holds exactly.
  2. our ``sh_encode`` equals both (it implements the torch-ngp forms).

Input convention note: torch-ngp feeds tcnn ``(d + 1) / 2`` because tcnn
internally rescales [0,1] -> [-1,1]; our encoder takes raw unit dirs, so the
polynomial inputs coincide.
"""

import numpy as np

from nerf_signature_tpu.ops.sh import sh_encode


def _tcnn_sh_deg4(d):
    """Literal transcription of tcnn's sh_enc, degree 4 (first 16 outputs).

    d: [N, 3] float64 (already in [-1, 1] — i.e. after tcnn's internal
    ``x * 2 - 1`` rescale of the [0,1] input torch-ngp passes it).
    """
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    out = np.empty((d.shape[0], 16), np.float64)
    out[:, 0] = 0.28209479177387814
    out[:, 1] = -0.48860251190291987 * y
    out[:, 2] = 0.48860251190291987 * z
    out[:, 3] = -0.48860251190291987 * x
    out[:, 4] = 1.0925484305920792 * xy
    out[:, 5] = -1.0925484305920792 * yz
    out[:, 6] = 0.94617469575755997 * z2 - 0.31539156525251999
    out[:, 7] = -1.0925484305920792 * xz
    out[:, 8] = 0.54627421529603959 * x2 - 0.54627421529603959 * y2
    out[:, 9] = 0.59004358992664352 * y * (-3.0 * x2 + y2)
    out[:, 10] = 2.8906114426405538 * xy * z
    out[:, 11] = 0.45704579946446572 * y * (1.0 - 5.0 * z2)
    out[:, 12] = 0.3731763325901154 * z * (5.0 * z2 - 3.0)
    out[:, 13] = 0.45704579946446572 * x * (1.0 - 5.0 * z2)
    out[:, 14] = 1.4453057213202769 * z * (x2 - y2)
    out[:, 15] = 0.59004358992664352 * x * (-x2 + 3.0 * y2)
    return out


def _torch_ngp_sh_deg4(d):
    """Literal transcription of the reference's pure-torch SHEncoder
    (``hash_encoding.py:114-195``), degree 4."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    out = np.empty((d.shape[0], 16), np.float64)
    out[:, 0] = 0.28209479177387814
    out[:, 1] = -C1 * y
    out[:, 2] = C1 * z
    out[:, 3] = -C1 * x
    out[:, 4] = C2[0] * xy
    out[:, 5] = C2[1] * yz
    out[:, 6] = C2[2] * (2.0 * zz - xx - yy)
    out[:, 7] = C2[3] * xz
    out[:, 8] = C2[4] * (xx - yy)
    out[:, 9] = C3[0] * y * (3 * xx - yy)
    out[:, 10] = C3[1] * xy * z
    out[:, 11] = C3[2] * y * (4 * zz - xx - yy)
    out[:, 12] = C3[3] * z * (2 * zz - 3 * xx - 3 * yy)
    out[:, 13] = C3[4] * x * (4 * zz - xx - yy)
    out[:, 14] = C3[5] * z * (xx - yy)
    out[:, 15] = C3[6] * x * (xx - 3 * yy)
    return out


def _unit_dirs(n=512, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_tcnn_equals_torch_ngp_on_unit_sphere():
    d = _unit_dirs()
    np.testing.assert_allclose(
        _tcnn_sh_deg4(d), _torch_ngp_sh_deg4(d), rtol=0, atol=1e-12
    )


def test_ours_equals_tcnn_on_unit_sphere():
    d = _unit_dirs()
    ours = np.asarray(sh_encode(d.astype(np.float32), degree=4), np.float64)
    np.testing.assert_allclose(ours, _tcnn_sh_deg4(d), rtol=0, atol=1e-5)


def test_bases_differ_off_sphere():
    """Documents WHY unit inputs matter: the pure-z² and sphere-restricted
    forms diverge off the sphere, so the parity claim is conditional on
    normalized dirs (which every caller guarantees)."""
    d = _unit_dirs() * 0.7
    assert np.abs(_tcnn_sh_deg4(d) - _torch_ngp_sh_deg4(d)).max() > 1e-3
