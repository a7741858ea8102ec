"""Block-streaming DSP ops.

Every op follows the pure streaming contract

    process(params, carry, x_block) -> (carry', y_block)

with static block shapes, so an entire receiver chain jits into one XLA
program and carries hand off across blocks (and across time-shards via
ppermute — see cutesdr_tpu.shard).
"""
