from cutesdr_tpu.pipeline.receiver import (ReceiverConfig, Receiver,
                                           receiver_step)
from cutesdr_tpu.pipeline.spectrum import SpectrumConfig, SpectrumAnalyzer
