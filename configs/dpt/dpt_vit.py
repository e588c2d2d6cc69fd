# DPT over a tiny ViT (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="VisionTransformer", embed_dim=96, depth=4,
                  num_heads=3, out_indices=(0, 1, 2, 3)),
    decode_head=dict(type="DPTHead", in_channels=(96, 96, 96, 96),
                     in_index=(0, 1, 2, 3), channels=64, embed_dims=96,
                     post_process_channels=(24, 48, 96, 96), num_classes=19,
                     dropout_ratio=0.0, align_corners=False),
    test_cfg=dict(mode="whole"),
)
