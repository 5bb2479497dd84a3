from .smpl import SMPLAssets, SMPLParams, smpl_forward, rest_joints
from .camera import Camera, project_points, load_cameras_txt
from .hybrik import forward_rotmats, hybrik_ik, twist_angles
