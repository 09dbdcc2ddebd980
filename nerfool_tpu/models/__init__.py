from nerfool_tpu.models.resunet import ResUNet
from nerfool_tpu.models.ibrnet import IBRNetAggregator
from nerfool_tpu.models.gnt import GNTAggregator
