# FCN over HRNet-W18 (zoo): upsample-concat all branches into FCNHead
model = dict(
    type="EncoderDecoder",
    backbone=dict(type="HRNet", base_channels=18),
    decode_head=dict(type="FCNHead", in_channels=270, in_index=(0, 1, 2, 3),
                     channels=270, num_convs=1, concat_input=False,
                     num_classes=19, dropout_ratio=-1, align_corners=False),
    test_cfg=dict(mode="whole"),
)
