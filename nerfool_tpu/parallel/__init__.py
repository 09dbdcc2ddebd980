from nerfool_tpu.parallel.mesh import get_mesh, shard_rays, replicate
