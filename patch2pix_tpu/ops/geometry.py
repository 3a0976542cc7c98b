"""Two-view epipolar geometry, differentiable (jnp) versions.

Capability parity with /root/reference/networks/utils.py:74-110
(``sym_epi_dist``/``sampson_dist``) and
/root/reference/utils/eval/geometry.py:6-20 (F/E/pose conversions),
written as pure jnp so they fuse into the training loss and run on
device with no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _epi_terms(matches: jax.Array, F: jax.Array):
    """Common epipolar algebra for an (N, 4) match set and 3x3 F.

    Returns (dd, l1, l2): dd[n] = p2_n^T F p1_n, l2 = F p1 (lines in
    image 2), l1 = F^T p2 (lines in image 1), each (3, N).
    """
    n = matches.shape[0]
    ones = jnp.ones((n, 1), dtype=F.dtype)
    p1 = jnp.concatenate([matches[:, 0:2], ones], axis=1)  # (N, 3)
    p2 = jnp.concatenate([matches[:, 2:4], ones], axis=1)
    l2 = F @ p1.T  # (3, N)
    l1 = F.T @ p2.T
    dd = jnp.sum(l2.T * p2, axis=1)  # (N,)
    return dd, l1, l2


def sampson_dist(matches: jax.Array, F: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Sampson (first-order reprojection) distance of matches under F.

    matches: ``(N, 4)`` as (x1, y1, x2, y2); F: ``(3, 3)`` with
    ``p2^T F p1 = 0`` for perfect correspondences. Returns ``(N,)``.
    Formula per /root/reference/networks/utils.py:95-110.
    """
    dd, l1, l2 = _epi_terms(matches.astype(F.dtype), F)
    denom = eps + l1[0] ** 2 + l1[1] ** 2 + l2[0] ** 2 + l2[1] ** 2
    return (dd**2 / denom).astype(jnp.float32)


def sym_epi_dist(
    matches: jax.Array, F: jax.Array, sqrt: bool = False, eps: float = 1e-8
) -> jax.Array:
    """Symmetric epipolar distance.

    NOTE: the reference hardcodes ``sqrt = False`` inside the function
    regardless of the argument (/root/reference/networks/utils.py:88);
    we default to False and honour the argument.
    """
    dd, l1, l2 = _epi_terms(matches.astype(F.dtype), F)
    inv1 = 1.0 / (eps + l1[0] ** 2 + l1[1] ** 2)
    inv2 = 1.0 / (eps + l2[0] ** 2 + l2[1] ** 2)
    if sqrt:
        d = jnp.abs(dd) * (jnp.sqrt(inv1) + jnp.sqrt(inv2))
    else:
        d = dd**2 * (inv1 + inv2)
    return d.astype(jnp.float32)


# batched variants: (B, N, 4) matches against (B, 3, 3) fundamentals
sampson_dist_batched = jax.vmap(sampson_dist, in_axes=(0, 0))
sym_epi_dist_batched = jax.vmap(sym_epi_dist, in_axes=(0, 0, None))


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix of a 3-vector."""
    z = jnp.zeros((), dtype=v.dtype)
    return jnp.array(
        [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]]
    )


def pose2ess(R: jax.Array, t: jax.Array) -> jax.Array:
    """Essential matrix from relative pose: E = [t]_x R."""
    return skew(t.reshape(3)) @ R


def ess2fund(K1: jax.Array, K2: jax.Array, E: jax.Array) -> jax.Array:
    """F = K2^-T E K1^-1."""
    return jnp.linalg.inv(K2).T @ E @ jnp.linalg.inv(K1)


def fund2ess(F: jax.Array, K2: jax.Array, K1: jax.Array) -> jax.Array:
    """E = K2^T F K1."""
    return K2.T @ F @ K1


def pose2fund(K1: jax.Array, K2: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Fundamental matrix from intrinsics + relative pose.

    Same formulation as the reference
    (/root/reference/utils/eval/geometry.py:15):
    F = K2^-T R K1^T [K1 R^T t]_x.
    """
    return jnp.linalg.inv(K2).T @ R @ K1.T @ skew((K1 @ R.T) @ t.reshape(3))


def quat2rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix."""
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rot2quat(R: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion (w, x, y, z).

    Branch-free Shepperd-style construction usable under jit.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick the numerically largest pivot
    qw = jnp.array(
        [1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22]
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2.0
    cand = jnp.stack(
        [
            jnp.array([qw[0], (m21 - m12) / (4 * qw[0]), (m02 - m20) / (4 * qw[0]), (m10 - m01) / (4 * qw[0])]),
            jnp.array([(m21 - m12) / (4 * qw[1]), qw[1], (m01 + m10) / (4 * qw[1]), (m02 + m20) / (4 * qw[1])]),
            jnp.array([(m02 - m20) / (4 * qw[2]), (m01 + m10) / (4 * qw[2]), qw[2], (m12 + m21) / (4 * qw[2])]),
            jnp.array([(m10 - m01) / (4 * qw[3]), (m02 + m20) / (4 * qw[3]), (m12 + m21) / (4 * qw[3]), qw[3]]),
        ]
    )
    best = jnp.argmax(qw)
    q = cand[best]
    return q / jnp.linalg.norm(q)


def abs2relapose(
    c1: jax.Array, c2: jax.Array, q1: jax.Array, q2: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Relative pose (t12, q12) from two absolute camera poses.

    Same convention as /root/reference/utils/eval/geometry.py:73-89:
    R12 = R2 R1^T, t12 = R2 (c1 - c2).
    """
    r1 = quat2rot(q1)
    r2 = quat2rot(q2)
    r12 = r2 @ r1.T
    t12 = r2 @ (c1 - c2)
    return t12, rot2quat(r12)
