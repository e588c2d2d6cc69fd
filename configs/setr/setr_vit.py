# SETR-style ViT + FCN head (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="VisionTransformer", embed_dim=192, depth=4,
                  num_heads=3, out_indices=(0, 1, 2, 3)),
    decode_head=dict(type="FCNHead", in_channels=192, in_index=3,
                     channels=128, num_convs=1, concat_input=False,
                     num_classes=19, dropout_ratio=0.1,
                     align_corners=False),
    test_cfg=dict(mode="whole"),
)
