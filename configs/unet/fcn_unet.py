# FCN over U-Net (zoo)
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="UNet", base_channels=16, num_stages=4),
    decode_head=dict(type="FCNHead", in_channels=16, in_index=0, channels=16,
                     num_convs=1, concat_input=False, num_classes=2,
                     dropout_ratio=0.1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
