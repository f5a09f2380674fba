from msml_tpu.losses.ce import cross_entropy, smoothed_one_hot_ce
from msml_tpu.losses.consensus import structure_consensus_loss
