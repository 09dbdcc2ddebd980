from nerfool_tpu.attack.perturb import init_delta, project_delta, clamp
from nerfool_tpu.attack.attack import AttackConfig, make_attack_step, run_attack_scan
