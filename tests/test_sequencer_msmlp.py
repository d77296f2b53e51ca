import jittor_mlp_tpu as jm
import jittor_mlp_tpu.models.sequencer as jseq
from parity import check_parity
from ref_loader import load_ref

SEQ_XS = [[1, 1], [16, 32], [8, 8], 2]


def test_sequencer_parity():
    load_ref("sequencer").sequencer_settings["XS"] = SEQ_XS
    jseq.sequencer_settings["XS"] = SEQ_XS
    # patch sizes [7,2,1,1]: 28 -> 4 -> 2
    check_parity(
        "sequencer",
        "Sequencer2D",
        jm.Sequencer2D,
        dict(model_name="XS", num_classes=10),
        input_shape=(2, 3, 28, 28),
    )


def test_ms_mlp_parity():
    check_parity(
        "ms_mlp",
        "MS_MLP",
        jm.MS_MLP,
        dict(
            img_size=32,
            patch_size=4,
            num_classes=10,
            embed_dim=16,
            depths=[2, 2],
            shift_size=3,
            shift_dist=[-1, 0, 1],
            mix_size=[[1, 3, 5], [1, 3, 3]],
            drop_path_rate=0.0,
        ),
        input_shape=(2, 3, 32, 32),
    )
