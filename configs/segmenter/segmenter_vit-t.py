# Segmenter mask transformer over a tiny ViT (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="VisionTransformer", embed_dim=192, depth=2,
                  num_heads=3, out_indices=(0, 1)),
    decode_head=dict(type="SegmenterMaskTransformerHead", in_channels=192,
                     channels=192, num_layers=1, num_heads=3, num_classes=19,
                     in_index=-1, dropout_ratio=0.0, align_corners=False),
    test_cfg=dict(mode="whole"),
)
