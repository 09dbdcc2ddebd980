from nerfool_tpu.render.sampling import sample_along_camera_ray, sample_pdf, sample_fine_zvals
from nerfool_tpu.render.compositor import raw2outputs
from nerfool_tpu.render.projection import project_points, compute_angles, epipolar_gather
