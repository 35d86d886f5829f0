from brax_rodent_run_tpu.preprocessing.clips import (  # noqa: F401
    ReferenceClip,
    compute_velocity_from_kinematics,
    extract_features,
    load_reference_clip_from_h5,
    process_clip,
    process_clip_to_train,
    save_reference_clip_to_h5,
)
from brax_rodent_run_tpu.preprocessing.rescale import rescale_model  # noqa: F401
