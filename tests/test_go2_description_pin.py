"""Pin models/go2_params.py to the vendored go2_description table.

The reference loads masses/inertias/offsets from the `go2_description`
URDF (reference go2_robot_data.py:11-13,113-117); this repo transcribes
them into models/go2_params.py, and everything downstream (analytic
dynamics, the generated MJCF, the MuJoCo cross-validation oracle) derives
from that one transcription — so all backends would "agree by
construction" even on a typo. models/data/go2_description_pin.json is a
second, independent transcription of the same public asset (with
provenance notes); this test compares the two field by field so a typo in
either is a test failure, and validates the left/right / front/rear
mirroring against reflection rules (the URDF's FR/RL/RR entries are CAD
mirrors of the FL side).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from convex_mpc_tpu.models import go2_params as G

PIN = json.loads(
    (
        Path(__file__).resolve().parents[1]
        / "convex_mpc_tpu"
        / "models"
        / "data"
        / "go2_description_pin.json"
    ).read_text()
)
P = G.DEFAULT_PARAMS


def _check_link(link: G.LinkInertia, pinned: dict):
    assert link.mass == pytest.approx(pinned["mass"], abs=0.0), "mass"
    np.testing.assert_array_equal(np.asarray(link.com), np.asarray(pinned["com"]))
    np.testing.assert_array_equal(
        np.asarray(link.inertia),
        np.asarray(pinned["inertia_ixx_iyy_izz_ixy_ixz_iyz"]),
    )


def test_kinematic_tree_matches_pin():
    kin = PIN["kinematics"]
    np.testing.assert_array_equal(P.hip_joint_pos(0), kin["hip_joint_origin_FL"])
    np.testing.assert_array_equal(P.thigh_joint_pos(0), kin["thigh_joint_origin_FL"])
    np.testing.assert_array_equal(P.calf_joint_pos(), kin["calf_joint_origin"])
    np.testing.assert_array_equal(P.foot_pos_in_calf(), kin["foot_fixed_origin"])
    assert P.foot_radius == kin["foot_collision_radius"]


def test_fl_link_inertials_match_pin():
    _check_link(P.trunk, PIN["links"]["trunk"])
    _check_link(P.hip_fl, PIN["links"]["FL_hip"])
    _check_link(P.thigh_fl, PIN["links"]["FL_thigh"])
    _check_link(P.calf_fl, PIN["links"]["FL_calf"])
    assert P.foot_mass == PIN["links"]["foot"]["mass"]


def test_torque_limits_match_pin():
    j = PIN["joints"]
    assert P.hip_torque_max == j["hip_effort_limit_nm"]
    assert P.thigh_torque_max == j["thigh_effort_limit_nm"]
    assert P.calf_torque_max == j["calf_effort_limit_nm"]


def test_aggregates_match_pin():
    agg = PIN["aggregates"]
    assert P.total_mass() == pytest.approx(agg["total_mass_kg"], abs=1e-9)
    assert P.stand_height == agg["stand_height_m"]
    np.testing.assert_array_equal(
        np.asarray(P.default_joint_angles), np.asarray(agg["default_joint_angles"])
    )


def _reflect(com, inertia, flip_x, flip_y):
    """Reflection of a rigid body's COM + inertia across x=0 / y=0 planes:
    the reflected COM coordinate flips sign and every inertia product
    involving the reflected axis exactly once flips sign (I' = R I R' for
    the diagonal reflection matrix R)."""
    cx, cy, cz = com
    ixx, iyy, izz, ixy, ixz, iyz = inertia
    if flip_x:
        cx, ixy, ixz = -cx, -ixy, -ixz
    if flip_y:
        cy, ixy, iyz = -cy, -ixy, -iyz
    return (cx, cy, cz), (ixx, iyy, izz, ixy, ixz, iyz)


@pytest.mark.parametrize("leg,flip_x,flip_y", [(1, False, True), (2, True, False), (3, True, True)])
def test_mirrored_hips_follow_reflection_rules(leg, flip_x, flip_y):
    # the URDF's FR/RL/RR hip entries are CAD reflections of FL_hip —
    # validate the in-repo _mirror against an independent reflection impl
    fl = PIN["links"]["FL_hip"]
    com, inertia = _reflect(
        fl["com"], fl["inertia_ixx_iyy_izz_ixy_ixz_iyz"], flip_x, flip_y
    )
    got = G._mirror(P.hip_fl, flip_x=flip_x, flip_y=flip_y)
    assert got.mass == fl["mass"]
    np.testing.assert_array_equal(np.asarray(got.com), np.asarray(com))
    np.testing.assert_array_equal(np.asarray(got.inertia), np.asarray(inertia))


def test_reflection_preserves_spectrum_and_com_radius():
    # physical sanity of the mirror: reflection is a similarity transform,
    # so eigenvalues of the inertia tensor and |com| are invariants
    for body in ("hip", "thigh", "calf"):
        base = {"hip": P.hip_fl, "thigh": P.thigh_fl, "calf": P.calf_fl}[body]
        ev0 = np.sort(np.linalg.eigvalsh(base.inertia_matrix()))
        for leg in range(4):
            sx, sy = P.leg_sign(leg)
            link = G._mirror(base, flip_x=(sx < 0), flip_y=(sy < 0))
            ev = np.sort(np.linalg.eigvalsh(link.inertia_matrix()))
            np.testing.assert_allclose(ev, ev0, rtol=0, atol=0)
            assert np.linalg.norm(link.com) == pytest.approx(
                np.linalg.norm(base.com), abs=0.0
            )


def test_lumped_calf_foot_preserves_mass_and_com():
    # deliberate deviation (documented in the pin file): foot lumped into
    # calf — mass and combined first moment must be exactly preserved
    calf = P.link_inertia("calf", 0)
    m_c, m_f = PIN["links"]["FL_calf"]["mass"], PIN["links"]["foot"]["mass"]
    assert calf.mass == pytest.approx(m_c + m_f, abs=1e-12)
    c0 = np.asarray(PIN["links"]["FL_calf"]["com"])
    p_foot = np.asarray(PIN["kinematics"]["foot_fixed_origin"])
    expect = (m_c * c0 + m_f * p_foot) / (m_c + m_f)
    np.testing.assert_allclose(np.asarray(calf.com), expect, atol=1e-12)
