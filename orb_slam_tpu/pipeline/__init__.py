"""Pipeline: tracking state machine, local mapping, loop closing, system.

Host orchestration is thin Python; all per-frame and per-keyframe math is
jitted device kernels over fixed shapes. The reference's 3-thread pipeline
(Tracking / LocalMapping / LoopClosing, SURVEY.md §2.3) maps to three stage
functions that the system runs either strictly sequentially (deterministic
mode, used by tests) or overlapped (async mode)."""
