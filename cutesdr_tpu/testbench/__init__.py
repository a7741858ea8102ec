from cutesdr_tpu.testbench.generators import GenConfig, SignalGenerator
