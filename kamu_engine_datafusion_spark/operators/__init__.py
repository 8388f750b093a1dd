"""Engine-native operators: ODF normalization/validation/system-columns,
plus the large-scale training-data operators (dedup, similarity, text,
multimodal)."""
