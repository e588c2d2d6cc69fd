# SegFormer MiT-B0 (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="MixVisionTransformer"),
    decode_head=dict(
        type="SegFormerHead", in_channels=(32, 64, 160, 256), channels=256,
        num_classes=19, dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
