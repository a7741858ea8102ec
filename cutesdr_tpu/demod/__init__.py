"""Demodulators: AM, SAM, FM, SSB/CW (7 UI modes).

Mode registry mirrors the reference mode set (dsp/demodulator.h:20-28).
Each demod follows the streaming contract
``process(params, carry, x) -> (carry, audio)``; the stereo variants return
complex audio (re=left, im=right).
"""

DEMOD_AM = 0
DEMOD_SAM = 1
DEMOD_FM = 2
DEMOD_USB = 3
DEMOD_LSB = 4
DEMOD_CWU = 5
DEMOD_CWL = 6

NUM_DEMODS = 7

MODE_NAMES = {
    DEMOD_AM: "am", DEMOD_SAM: "sam", DEMOD_FM: "fm", DEMOD_USB: "usb",
    DEMOD_LSB: "lsb", DEMOD_CWU: "cwu", DEMOD_CWL: "cwl",
}
MODE_IDS = {v: k for k, v in MODE_NAMES.items()}
