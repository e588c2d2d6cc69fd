# UPerNet over a tiny BEiT encoder (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="BEiT", embed_dim=96, depth=4, num_heads=3,
                  patch_size=16, out_indices=(0, 1, 2, 3)),
    decode_head=dict(type="UPerHead", in_channels=(96, 96, 96, 96),
                     in_index=(0, 1, 2, 3), channels=64, num_classes=19,
                     dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
