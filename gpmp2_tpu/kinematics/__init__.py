"""Robot kinematics (reference: /root/reference/gpmp2/kinematics)."""

from .fk import (
    ArmFK,
    PointRobotFK,
    Pose2Mobile2ArmsFK,
    Pose2MobileArmFK,
    Pose2MobileBaseFK,
    Pose2MobileVetLin2ArmsFK,
    Pose2MobileVetLinArmFK,
    arm_link_velocities,
    base_pose3,
    dof_of,
    link_poses,
    num_links_of,
    state_space_of,
)
from .factors import (
    goal_factor_error,
    hinge_limit_cost,
    joint_limit_error,
    velocity_limit_error,
    workspace_orientation_error,
    workspace_pose_error,
    workspace_position_error,
)
from .robot import RobotModel, make_robot_model
from .robot import sphere_centers_world

__all__ = [
    "ArmFK", "PointRobotFK", "Pose2MobileBaseFK", "Pose2MobileArmFK",
    "Pose2Mobile2ArmsFK", "Pose2MobileVetLinArmFK", "Pose2MobileVetLin2ArmsFK",
    "link_poses", "arm_link_velocities", "base_pose3", "dof_of",
    "num_links_of", "state_space_of", "RobotModel", "make_robot_model",
    "sphere_centers_world",
    "hinge_limit_cost", "joint_limit_error", "velocity_limit_error",
    "goal_factor_error", "workspace_position_error",
    "workspace_orientation_error", "workspace_pose_error",
]
