# UPerNet over Swin-T (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="SwinTransformer", embed_dim=96,
                  depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    decode_head=dict(type="UPerHead", in_channels=(96, 192, 384, 768),
                     channels=512, num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
