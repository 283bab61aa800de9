"""Operator library: step-1 metric transforms, the step-2 join pipeline,
pivot-scatter, and the training-data operators (dedup, similarity,
multimodal, text analysis)."""
