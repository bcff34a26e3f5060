"""Real spherical-harmonics direction encoding.

Optional-parity equivalent of the reference's CUDA `shencoder`
(`core/nets/occnerf/shencoder/`): the direction encoder is commented out of
the active canonical MLP (`occnerf_mlp.py:46`) but kept for completeness.
Supports the CUDA kernel's full degree range 1..8
(`shencoder/src/shencoder.cu:28`): degrees 1..4 (the configured
``SHEncoder(degree=4)``) via the standard hardcoded polynomial basis,
degrees 5..8 via a Cartesian associated-Legendre recurrence evaluating the
same real-SH convention (Condon-Shortley phase, per-l ordering
m = -l..l).  Fully differentiable.  Inputs are assumed unit-ish direction
vectors.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# standard real-SH constants (same basis the CUDA kernel hardcodes)
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def _sh_general(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real SH basis for any degree via recurrences (unrolled at trace
    time).  Convention matches the hardcoded constants above: with
    Condon-Shortley phase,

      y_l^m = sqrt(2) K(l,|m|) * {cos,sin}(|m| phi) * P_l^{|m|}(cos th)

    for m >0 / m<0 and K(l,0) P_l(cos th) for m=0, ordered m=-l..l per l.
    The azimuthal factor sin^|m|(th)*{cos,sin}(|m| phi) is carried in
    Cartesian form as Re/Im((x+iy)^m), so only the polynomial part
    Q_l^m(z) = P_l^m(z) / (1-z^2)^{m/2} is recursed:

      Q_m^m     = (-1)^m (2m-1)!!
      Q_{m+1}^m = z (2m+1) Q_m^m
      Q_l^m     = ((2l-1) z Q_{l-1}^m - (l+m-1) Q_{l-2}^m) / (l-m)
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(z)

    # A_m = Re((x+iy)^m), B_m = Im((x+iy)^m)
    A = [one]
    B = [jnp.zeros_like(z)]
    for m in range(1, degree):
        A.append(x * A[-1] - y * B[-1])
        B.append(x * B[-1] + y * A[-2])

    # Q[m][l - m] polynomial parts
    Q = []
    for m in range(degree):
        qmm = ((-1.0) ** m) * math.prod(range(1, 2 * m, 2))
        col = [qmm * one]
        if m + 1 < degree:
            col.append(z * (2 * m + 1) * qmm)
        for l in range(m + 2, degree):
            col.append(((2 * l - 1) * z * col[-1]
                        - (l + m - 1) * col[-2]) / (l - m))
        Q.append(col)

    def K(l, m):
        return math.sqrt((2 * l + 1) / (4.0 * math.pi)
                         * math.factorial(l - m) / math.factorial(l + m))

    out = []
    for l in range(degree):
        for m in range(-l, l + 1):
            am = abs(m)
            q = Q[am][l - am]
            if m == 0:
                out.append(K(l, 0) * q)
            elif m > 0:
                out.append(math.sqrt(2.0) * K(l, am) * q * A[am])
            else:
                out.append(math.sqrt(2.0) * K(l, am) * q * B[am])
    return jnp.stack(out, axis=-1)


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Encode directions (..., 3) -> (..., degree^2) SH basis values."""
    assert 1 <= degree <= 8, "sh_encode supports degree 1..8"
    if degree > 4:
        return _sh_general(dirs, degree)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, C0)]
    if degree > 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy)]
    if degree > 3:
        out += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                C3[2] * y * (4 * zz - xx - yy),
                C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                C3[4] * x * (4 * zz - xx - yy),
                C3[5] * z * (xx - yy), C3[6] * x * (xx - 3 * yy)]
    return jnp.stack(out, axis=-1)
