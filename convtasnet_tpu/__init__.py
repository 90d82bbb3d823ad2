"""convtasnet_tpu — a TPU-native time-domain speech separation framework.

Built from scratch in JAX/XLA/Pallas/pjit with the full capability surface
of the reference Conv-TasNet implementation (jwr1995/Conv-TasNet): learned
conv encoder/decoder, dilated depthwise-separable TCN mask estimation with
gLN/cLN/BN, uPIT SI-SNR training, overlap-add reconstruction, bucketed
audio pipelines, checkpoint/resume, LR scheduling, SI-SNRi/SDRi evaluation,
and wav inference — plus mesh-based data/tensor/context parallelism and
fused Pallas kernels that have no reference analogue.
"""

from .config import ConvTasNetConfig, EvalConfig, TrainConfig, EPS
from .models.conv_tasnet import ConvTasNet, forward, init_params
from .ops.loss import cal_loss, si_snr_with_pit, reorder_source

__version__ = "0.1.0"
