"""Golden-value tests for batch3dmot_tpu.geometry.

Reference semantics from /root/reference/batch_3dmot/utils/geo_utils.py and
utils/nuscenes.py; goldens computed by hand / straightforward numpy.
"""

import numpy as np
import pytest

from batch3dmot_tpu import geometry as geo


def test_quat_rotation_matrix_identity():
    R = geo.quat_rotation_matrix(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)


def test_quat_rotation_matrix_yaw90():
    # 90 deg about z: (cos45, 0, 0, sin45)
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    R = geo.quat_rotation_matrix(q)
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-12)


def test_quaternion_yaw_matches_rotation():
    for yaw in [-3.0, -1.2, 0.0, 0.7, 2.9]:
        q = geo.yaw_to_quat(yaw)
        assert geo.quaternion_yaw(q) == pytest.approx(yaw, abs=1e-12)


def test_quaternion_yaw_batched():
    yaws = np.array([0.1, -0.5, 2.0])
    qs = geo.yaw_to_quat(yaws)
    np.testing.assert_allclose(geo.quaternion_yaw(qs), yaws, atol=1e-12)


def test_quat_multiply_compose():
    q1 = geo.yaw_to_quat(0.3)
    q2 = geo.yaw_to_quat(0.5)
    q12 = geo.quat_multiply(q1, q2)
    assert geo.quaternion_yaw(q12) == pytest.approx(0.8, abs=1e-12)


def test_quat_inverse():
    q = geo.yaw_to_quat(1.1)
    qi = geo.quat_inverse(q)
    prod = geo.quat_multiply(q, qi)
    np.testing.assert_allclose(prod, [1, 0, 0, 0], atol=1e-12)


def test_angle_diff_basic():
    # reference geo_utils.py:7-21
    assert geo.angle_diff(0.5, 0.2) == pytest.approx(0.3)
    assert geo.angle_diff(0.2, 0.5) == pytest.approx(-0.3)
    # wraps around: diff of pi+0.1 folds to -(pi-0.1)
    assert geo.angle_diff(np.pi + 0.1, 0.0) == pytest.approx(-(np.pi - 0.1))


def test_center_distance_xy_ignores_z():
    c1 = np.array([0.0, 0.0, 10.0])
    c2 = np.array([3.0, 4.0, -7.0])
    assert geo.center_distance_xy(c1, c2) == pytest.approx(5.0)


def test_scale_iou_golden():
    # identical boxes -> 1
    wlh = np.array([2.0, 4.0, 1.5])
    assert geo.scale_iou(wlh, wlh) == pytest.approx(1.0)
    # vol1=8, vol2=1, inter=1, union=8 -> 1/8
    assert geo.scale_iou([2, 2, 2], [1, 1, 1]) == pytest.approx(1 / 8)


def test_box_volume():
    assert geo.box_volume([2, 3, 4]) == pytest.approx(24.0)
    np.testing.assert_allclose(geo.box_volume([[2, 3, 4], [1, 1, 1]]), [24.0, 1.0])


def test_box_corners_axis_aligned():
    # w=2 (y extent), l=4 (x extent), h=6 (z extent), identity rotation
    c = geo.box_corners([0, 0, 0], [2, 4, 6], [1, 0, 0, 0])
    assert c.shape == (3, 8)
    np.testing.assert_allclose(sorted(np.unique(c[0])), [-2, 2])
    np.testing.assert_allclose(sorted(np.unique(c[1])), [-1, 1])
    np.testing.assert_allclose(sorted(np.unique(c[2])), [-3, 3])
    # devkit corner 0 = (+l/2, +w/2, +h/2)
    np.testing.assert_allclose(c[:, 0], [2, 1, 3])


def test_bottom_corners_are_bottom():
    c = geo.bottom_corners([1, 2, 3], [2, 4, 6], geo.yaw_to_quat(0.3))
    np.testing.assert_allclose(c[2], np.full(4, 3 - 3.0), atol=1e-12)


def test_points_in_box_basic():
    pts = np.array([[0.0, 1.9, 2.1, 0.0], [0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 4.0]])
    mask = geo.points_in_box([0, 0, 0], [2, 4, 6], [1, 0, 0, 0], pts)
    assert list(mask) == [True, True, False, False]


def test_points_in_box_ignore_z():
    pts = np.array([[0.0], [0.0], [100.0]])
    assert not geo.points_in_box([0, 0, 0], [2, 4, 6], [1, 0, 0, 0], pts)[0]
    assert geo.points_in_box([0, 0, 0], [2, 4, 6], [1, 0, 0, 0], pts, ignore_z=True)[0]


def test_points_in_box_rotated():
    # box rotated 90deg: length now along y
    q = geo.yaw_to_quat(np.pi / 2)
    pts = np.array([[0.0, 0.0], [1.9, 0.0], [0.0, 0.0]])
    mask = geo.points_in_box([0, 0, 0], [2, 4, 2], q, pts)
    assert list(mask) == [True, True]
    pts2 = np.array([[1.9], [0.0], [0.0]])
    assert not geo.points_in_box([0, 0, 0], [2, 4, 2], q, pts2)[0]


def test_points_in_box_wlh_factor():
    pts = np.array([[2.05], [0.0], [0.0]])
    assert not geo.points_in_box([0, 0, 0], [2, 4, 6], [1, 0, 0, 0], pts)[0]
    assert geo.points_in_box([0, 0, 0], [2, 4, 6], [1, 0, 0, 0], pts, wlh_factor=1.05)[0]


def test_view_points_projection():
    intrinsic = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    pts = np.array([[0.0, 1.0], [0.0, 1.0], [1.0, 2.0]])
    out = geo.view_points(pts, intrinsic, normalize=True)
    np.testing.assert_allclose(out[:2, 0], [50, 50])
    np.testing.assert_allclose(out[:2, 1], [100, 100])


def test_count_box_corners_in_image():
    intrinsic = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    # box in front of camera, z in [4,6] -> projects near center of 100x100 img
    corners = geo.box_corners([0, 0, 5], [2, 2, 2], [1, 0, 0, 0])
    # camera frame: devkit z = depth. Swap axes so that z is along our z.
    vis, front = geo.count_box_corners_in_image(corners, intrinsic, (100, 100))
    assert front == 8
    assert vis == 8


def test_convex_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]])
    hull = geo.convex_hull(pts)
    assert len(hull) == 4
    assert geo.polygon_area(hull) == pytest.approx(1.0)


def test_clip_polygon():
    tri = np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]])
    clipped = geo.clip_polygon_to_box(tri, 0, 0, 2, 2)
    # area of triangle clipped to 2x2 box = 4 - 2*... compute: triangle area 8,
    # clipped region is the square minus the top-right triangle above x+y=4
    # within box: region {x,y in [0,2], x+y<=4} = whole box (max x+y = 4) -> 4
    assert geo.polygon_area(clipped) == pytest.approx(4.0)


def test_post_process_coords_inside():
    coords = [[10, 10], [20, 10], [20, 30], [10, 30]]
    out = geo.post_process_coords(coords, imsize=(100, 100))
    assert out == (10.0, 10.0, 20.0, 30.0)


def test_post_process_coords_partial():
    coords = [[-10, -10], [50, -10], [50, 50], [-10, 50]]
    out = geo.post_process_coords(coords, imsize=(100, 100))
    assert out == (0.0, 0.0, 50.0, 50.0)


def test_post_process_coords_outside():
    coords = [[-50, -50], [-10, -50], [-10, -10], [-50, -10]]
    assert geo.post_process_coords(coords, imsize=(100, 100)) is None


def test_iou2d_identical():
    # reference formula: inter / ((a1 - inter) + a2); identical boxes -> a/(0+a)=1
    v = geo.iou2d_bev([0, 0, 0], [2, 4, 2], [1, 0, 0, 0], [0, 0, 0], [2, 4, 2], [1, 0, 0, 0])
    assert v == pytest.approx(1.0)


def test_iou2d_disjoint():
    v = geo.iou2d_bev([0, 0, 0], [2, 4, 2], [1, 0, 0, 0], [100, 0, 0], [2, 4, 2], [1, 0, 0, 0])
    assert v == 0.0


def test_iou2d_half_overlap():
    # two 2x4 (w x l) boxes offset by half the length along x:
    # footprint 4 long (x), 2 wide (y); offset x by 2 -> inter=4, a1=a2=8
    # reference formula: 4 / ((8-4)+8) = 1/3
    v = geo.iou2d_bev([0, 0, 0], [2, 4, 2], [1, 0, 0, 0], [2, 0, 0], [2, 4, 2], [1, 0, 0, 0])
    assert v == pytest.approx(1 / 3)


def test_transform_matrix_roundtrip():
    t = np.array([1.0, 2.0, 3.0])
    q = geo.yaw_to_quat(0.7)
    tm = geo.transform_matrix(t, q)
    tm_inv = geo.transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(tm @ tm_inv, np.eye(4), atol=1e-12)


def test_global_ego_roundtrip(rng):
    centers = rng.normal(size=(5, 3))
    quats = geo.yaw_to_quat(rng.uniform(-np.pi, np.pi, size=5))
    vels = rng.normal(size=(5, 3))
    ego_t = np.array([10.0, -5.0, 1.0])
    ego_q = geo.yaw_to_quat(1.3)
    c2, q2, v2 = geo.boxes_global_to_ego(centers, quats, vels, ego_t, ego_q)
    c3, q3, v3 = geo.boxes_ego_to_global(c2, q2, v2, ego_t, ego_q)
    np.testing.assert_allclose(c3, centers, atol=1e-10)
    np.testing.assert_allclose(v3, vels, atol=1e-10)
    np.testing.assert_allclose(
        geo.quaternion_yaw(q3), geo.quaternion_yaw(quats), atol=1e-10
    )
