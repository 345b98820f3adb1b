"""Batched rotation math for the TPU-native AirGym port.

Replaces the reference's use of ``pytorch3d.transforms`` and the IsaacGym
torch quaternion helpers (reference: airgym/utils/torch_utils.py,
airgym/envs/base/hovering.py:464-486) with pure-jnp functions.

Conventions (matching the reference exactly):
  * Quaternions are stored **xyzw** (IsaacGym root-state layout,
    reference hovering.py:75 ``root_quats  # x,y,z,w``).
  * The PX4-controller boundary and pytorch3d use **wxyz**; helpers with a
    ``_wxyz`` suffix operate in that layout.
  * Euler conversions use the XYZ (intrinsic) convention, matching
    ``pytorch3d.transforms.euler_angles_to_matrix(..., 'XYZ')``.

Everything is shaped ``[..., 3/4/9]`` and is jit/vmap/grad-safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of xyzw quaternion(s)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b of xyzw quaternions (reference hovering.py:23-31)."""
    x1, y1, z1, w1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x2, y2, z2, w2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
    z = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_canonical(q: jnp.ndarray) -> jnp.ndarray:
    """Flip sign so w >= 0 (reference hovering.py:224-226)."""
    return jnp.where(q[..., 3:4] < 0.0, -q, q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by xyzw quaternion(s) q (body -> world)."""
    q_w = q[..., 3:4]
    q_vec = q[..., :3]
    a = v * (2.0 * q_w * q_w - 1.0)
    b = 2.0 * q_w * jnp.cross(q_vec, v)
    c = 2.0 * q_vec * jnp.sum(q_vec * v, axis=-1, keepdims=True)
    return a + b + c


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by the inverse of q (world -> body)."""
    return quat_rotate(quat_conjugate(q), v)


def quat_axis(q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Column `axis` of the rotation matrix = rotated basis vector
    (reference hovering.py:477-481)."""
    basis = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., axis].set(1.0)
    return quat_rotate(q, basis)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion -> [..., 3, 3] rotation matrix."""
    q = quat_normalize(q)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrix -> xyzw quaternion (w >= 0).

    Branch-free Shepperd-style reconstruction: compute all four candidate
    quaternions and select the numerically best via jnp.where, so it stays
    jit-friendly with no data-dependent control flow.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four squared magnitudes (times 4): w, x, y, z candidates.
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    # Candidate quaternions, each valid when its pivot is the largest.
    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # pivot w
    w_w = 0.5 * _safe_sqrt(qw2)
    q_w = jnp.stack(
        [(m21 - m12) / (4.0 * w_w), (m02 - m20) / (4.0 * w_w),
         (m10 - m01) / (4.0 * w_w), w_w], axis=-1)
    # pivot x
    x_x = 0.5 * _safe_sqrt(qx2)
    q_x = jnp.stack(
        [x_x, (m01 + m10) / (4.0 * x_x), (m02 + m20) / (4.0 * x_x),
         (m21 - m12) / (4.0 * x_x)], axis=-1)
    # pivot y
    y_y = 0.5 * _safe_sqrt(qy2)
    q_y = jnp.stack(
        [(m01 + m10) / (4.0 * y_y), y_y, (m12 + m21) / (4.0 * y_y),
         (m02 - m20) / (4.0 * y_y)], axis=-1)
    # pivot z
    z_z = 0.5 * _safe_sqrt(qz2)
    q_z = jnp.stack(
        [(m02 + m20) / (4.0 * z_z), (m12 + m21) / (4.0 * z_z), z_z,
         (m10 - m01) / (4.0 * z_z)], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    q = jnp.where(best == 0, q_w,
                  jnp.where(best == 1, q_x,
                            jnp.where(best == 2, q_y, q_z)))
    return quat_canonical(quat_normalize(q))


def quat_from_euler_xyz(euler: jnp.ndarray) -> jnp.ndarray:
    """XYZ (intrinsic) Euler angles [..., 3] -> xyzw quaternion.

    Matches pytorch3d's euler_angles_to_matrix(..., 'XYZ') composed with
    matrix_to_quaternion (reference hovering.py:323-325).
    """
    return matrix_to_quat(euler_xyz_to_matrix(euler))


def euler_xyz_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """XYZ intrinsic Euler [..., 3] -> rotation matrix R = Rx @ Ry @ Rz.

    Closed-form product (no matmul chain -> full fp32 accuracy on every
    backend regardless of default matmul precision).
    """
    a, b, c = euler[..., 0], euler[..., 1], euler[..., 2]
    ca, cb, cc = jnp.cos(a), jnp.cos(b), jnp.cos(c)
    sa, sb, sc = jnp.sin(a), jnp.sin(b), jnp.sin(c)
    m = jnp.stack([
        cb * cc, -cb * sc, sb,
        ca * sc + sa * sb * cc, ca * cc - sa * sb * sc, -sa * cb,
        sa * sc - ca * sb * cc, sa * cc + ca * sb * sc, ca * cb,
    ], axis=-1)
    return m.reshape(euler.shape[:-1] + (3, 3))


def matrix_to_euler_xyz(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> XYZ intrinsic Euler angles (pytorch3d convention).

    For R = Rx(a) Ry(b) Rz(c):
      R[0,2] = sin(b); R[1,2] = -sin(a)cos(b); R[2,2] = cos(a)cos(b);
      R[0,1] = -cos(b)sin(c); R[0,0] = cos(b)cos(c).
    """
    sy = jnp.clip(m[..., 0, 2], -1.0, 1.0)
    b = jnp.arcsin(sy)
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_to_euler_xyz(q: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_euler_xyz(quat_to_matrix(q))


def yaw_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw (rotation about world z) of an xyzw quaternion, ZYX-style heading.

    This is the heading used by the flight controller (PX4 convention),
    distinct from the XYZ-euler 'c' angle used in rewards.
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap to [-pi, pi] (reference compute_yaw_diff, hovering.py:33-38)."""
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def yaw_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Wrapped difference b - a (reference hovering.py:33-38)."""
    return wrap_angle(b - a)


def xyzw_to_wxyz(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_body: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate xyzw quaternion by body-frame angular velocity over dt.

    q_{t+1} = q_t * exp(0.5 * dt * omega)  — exact exponential-map update,
    unconditionally stable (unlike the Euler qdot update) and branch-free.
    """
    half_angle = 0.5 * dt * jnp.linalg.norm(omega_body, axis=-1, keepdims=True)
    # sinc-based axis: sin(theta)/theta * (0.5*dt*omega)
    sinc = jnp.sinc(half_angle / jnp.pi)  # sin(x)/x with jnp.sinc(x) = sin(pi x)/(pi x)
    vec = 0.5 * dt * omega_body * sinc
    dq = jnp.concatenate([vec, jnp.cos(half_angle)], axis=-1)
    return quat_normalize(quat_mul(q, dq))
