from nerfool_tpu.utils.cameras import (
    make_camera_vector,
    parse_camera,
    get_rays,
    rotation_matrix_from_euler,
    transform_src_cameras,
)
