"""Filter-design routines (trace-time, NumPy float64).

All design math runs on the host at configuration time and produces constant
coefficient arrays that are baked into the jitted pipeline.  The formulas
reproduce the reference's design math so that designed filters are identical
in float64 (reference: dsp/fir.cpp, dsp/fastfir.cpp, dsp/iir.cpp,
dsp/downconvert.cpp SetDataRate).
"""

from cutesdr_tpu.design.decimation_plan import DecimationPlan, plan_decimation
from cutesdr_tpu.design.fir_kaiser import (
    design_lowpass,
    design_highpass,
    hilbert_bandpass,
    kaiser_beta,
    izero,
)
from cutesdr_tpu.design.fastfir_design import design_fastfir, CONV_FFT_SIZE, CONV_FIR_SIZE
from cutesdr_tpu.design.iir_biquad import biquad_lowpass, biquad_highpass, biquad_bandpass, biquad_notch
from cutesdr_tpu.design.windows import window_table
