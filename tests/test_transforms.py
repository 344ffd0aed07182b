"""Transform matrix unit tests: rotation conventions, composition order,
TRS Euler order — the float-fidelity hard part #3 from SURVEY.md section 7."""

import numpy as np
import pytest

from cosig_tpu.models.scene import CompositeTransformation, TransformElement
from cosig_tpu.scene import transforms as tf


def v(m, p):
    return m[:3, :3] @ np.asarray(p, dtype=np.float32) + m[:3, 3]


def test_rotation_x_convention():
    # Unity: AngleAxis(90, right) * up == forward (0,0,1)
    m = tf.rotate_x(90.0)
    np.testing.assert_allclose(v(m, (0, 1, 0)), (0, 0, 1), atol=1e-6)


def test_rotation_y_convention():
    # AngleAxis(90, up) * forward == right (1,0,0)
    m = tf.rotate_y(90.0)
    np.testing.assert_allclose(v(m, (0, 0, 1)), (1, 0, 0), atol=1e-6)


def test_rotation_z_convention():
    # AngleAxis(90, forward) * right == up (0,1,0)
    m = tf.rotate_z(90.0)
    np.testing.assert_allclose(v(m, (1, 0, 0)), (0, 1, 0), atol=1e-6)


def test_composition_first_element_outermost():
    # M = T @ R: rotate first (innermost = last element), then translate.
    comp = CompositeTransformation(
        [TransformElement.translation((10, 0, 0)), TransformElement.rotation_z(90.0)]
    )
    m = tf.build_composite(comp)
    np.testing.assert_allclose(v(m, (1, 0, 0)), (10, 1, 0), atol=1e-5)


def test_non_commuting_chain():
    # T(1,0,0) then S(2,2,2): point p -> T @ S @ p = 2p + (1,0,0)
    comp = CompositeTransformation(
        [TransformElement.translation((1, 0, 0)), TransformElement.scale((2, 2, 2))]
    )
    m = tf.build_composite(comp)
    np.testing.assert_allclose(v(m, (1, 1, 1)), (3, 2, 2), atol=1e-6)


def test_trs_euler_order():
    # Unity Euler: R = Ry @ Rx @ Rz. With x=90: up -> forward before Ry.
    m = tf.trs_euler((0, 0, 0), (90, 0, 0))
    np.testing.assert_allclose(v(m, (0, 1, 0)), (0, 0, 1), atol=1e-6)
    # Combined: rz=90 applied first, then rx=90: right -> up -> forward.
    m2 = tf.trs_euler((5, 0, 0), (90, 0, 90))
    np.testing.assert_allclose(v(m2, (1, 0, 0)), (5, 0, 1), atol=1e-6)


def test_inverse_roundtrip():
    comp = CompositeTransformation(
        [
            TransformElement.translation((0, 0, -74)),
            TransformElement.rotation_x(-60),
            TransformElement.rotation_z(45),
        ]
    )
    m = tf.build_composite(comp)
    mi = tf.inverse(m)
    np.testing.assert_allclose(m @ mi, np.eye(4), atol=1e-5)


def test_normal_matrix_nonuniform_scale():
    m = tf.scale((2, 1, 1))
    nm = tf.normal_matrix(m)
    # Normal (1,1,0)/sqrt2 on a surface scaled 2x in x must tilt toward y.
    n = nm[:3, :3] @ np.array([1.0, 1.0, 0.0], dtype=np.float32)
    n = n / np.linalg.norm(n)
    assert n[1] > n[0] > 0


def test_out_of_range_index_gives_identity():
    from cosig_tpu.models.scene import SceneData

    s = SceneData()
    np.testing.assert_array_equal(tf.build_matrix(s, 5), np.eye(4, dtype=np.float32))


def test_matrices_are_float32():
    assert tf.rotate_x(12.3).dtype == np.float32
    assert tf.trs_euler((1, 2, 3), (4, 5, 6)).dtype == np.float32


def test_singular_matrix_degrades_to_identity():
    # Zero scale in a scene file must not crash rendering (graceful
    # degradation, matching the reference's error philosophy).
    m = tf.scale((0, 0, 0))
    np.testing.assert_array_equal(tf.inverse(m), np.eye(4, dtype=np.float32))
