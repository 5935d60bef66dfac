"""pygmu2_tpu — a TPU-native lazy audio DSP framework.

A from-scratch rebuild of the capabilities of rdpoor/pygmu2 designed for
TPU hardware: the user-facing API (ProcessingElement DAGs, Snippet,
Extent, renderers, temperament utilities) is preserved, but under the hood
every graph compiles to a single jitted XLA program — pure PEs vectorize
over absolute sample indices, stateful PEs thread a carried state pytree,
sample-serial recurrences run as scan/Pallas kernels batched over
voices × channels, and long timelines render in one ``lax.scan`` launch.
"""

from pygmu2_tpu.core import prec as _prec  # noqa: F401  (x64 setup first)

from pygmu2_tpu.core.config import (
    ErrorMode,
    get_error_mode,
    get_sample_rate,
    handle_error,
    set_error_mode,
    set_sample_rate,
)
from pygmu2_tpu.core.extent import Extent, ExtendMode
from pygmu2_tpu.core.logger import get_logger, set_global_logging
from pygmu2_tpu.core.processing_element import ProcessingElement, SourcePE
from pygmu2_tpu.core.renderer import (
    NullRenderer,
    PEProfile,
    ProfileReport,
    Renderer,
)
from pygmu2_tpu.core.snippet import Snippet

from pygmu2_tpu.core.audio_renderer import AudioRenderer
from pygmu2_tpu.models.basic import (
    ArrayPE,
    ConstantPE,
    DiracPE,
    GainPE,
    IdentityPE,
    MixPE,
    ParamPE,
    TransformPE,
)
from pygmu2_tpu.models.convolve import ConvolvePE, ReverbPE
from pygmu2_tpu.models.delay import DelayPE
from pygmu2_tpu.models.dynamics import (
    CompressorPE,
    DynamicsPE,
    ExpanderPE,
    LimiterPE,
)
from pygmu2_tpu.models.filters import BiquadPE, SVFilterPE
from pygmu2_tpu.models.io_pes import AudioReaderPE, WavReaderPE, WavWriterPE
from pygmu2_tpu.models.modes import (
    BiquadMode,
    DetectionMode,
    DynamicsMode,
    InterpolationMode,
    LadderMode,
    NoiseMode,
    OutOfBoundsMode,
    RandomMode,
    SequenceMode,
    SlewMode,
    TransitionType,
    WindowMode,
)
from pygmu2_tpu.models.envelopes import AdsrGatedPE, AdsrTriggeredPE, EnvelopePE
from pygmu2_tpu.models.gates import (
    GateSignal,
    PeriodicGate,
    PeriodicTrigger,
    TriggerSignal,
)
from pygmu2_tpu.models.holds import (
    CachePE,
    ControlPE,
    SampleHoldPE,
    SlewLimiterPE,
    TrackHoldPE,
)
from pygmu2_tpu.models.loop_slice import LoopPE, SequencePE, SlicePE
from pygmu2_tpu.models.noise import NoisePE
from pygmu2_tpu.models.random_control import RandomPE
from pygmu2_tpu.models.lookup import TimeWarpPE, WavetablePE, WindowPE
from pygmu2_tpu.models.osc_bandlimited import AnalogOscPE, BlitSawPE, SuperSawPE
from pygmu2_tpu.models.oscillators import FunctionGenPE, SinePE
from pygmu2_tpu.models.portamento import PortamentoPE
from pygmu2_tpu.models.physical import (
    CombPE,
    KarplusStrongPE,
    LadderPE,
    rho_for_decay_db,
)
from pygmu2_tpu.models.meltysynth_pe import MeltysynthPE
from pygmu2_tpu.models.midi_in import MidiInPE
from pygmu2_tpu.models.piecewise import PiecewisePE
from pygmu2_tpu.models.reverse_echo import ReversePitchEchoPE
from pygmu2_tpu.models.spatial import (
    SpatialAdapter,
    SpatialConstantPower,
    SpatialHRTF,
    SpatialLinear,
    SpatialMethod,
    SpatialPE,
)
from pygmu2_tpu.models.tralfam import TralfamPE
from pygmu2_tpu.models.trigger_restart import (
    RandomSelectPE,
    ResetPE,
    TriggerMode,
    TriggerPE,
    TriggerRestartPE,
)
from pygmu2_tpu.models.window import CropPE, SetExtentPE
from pygmu2_tpu.utils.assets import (
    AssetLoader,
    AssetManager,
    AudioLibrary,
    GithubUserContentAssetLoader,
    GoogleDriveAssetLoader,
)
from pygmu2_tpu.utils.debug import print_pe_tree
from pygmu2_tpu.utils.conversions import (
    db_to_ratio,
    freq_to_pitch,
    pitch_to_freq,
    ratio_to_db,
    ratio_to_semitones,
    samples_to_seconds,
    seconds_to_samples,
    semitones_to_ratio,
)
from pygmu2_tpu.utils.playback import (
    browse,
    play,
    play_offline,
    render_to_array,
    render_to_file,
)
from pygmu2_tpu.utils.temperament import (
    CustomTemperament,
    EqualTemperament,
    JustIntonation,
    PythagoreanTuning,
    Temperament,
    get_reference_frequency,
    get_temperament,
    set_baroque_pitch,
    set_concert_pitch,
    set_reference_frequency,
    set_temperament,
    set_verdi_tuning,
)

__version__ = "0.1.0"

__all__ = [
    # Configuration
    "ErrorMode",
    "set_error_mode",
    "get_error_mode",
    "handle_error",
    "set_sample_rate",
    "get_sample_rate",
    # Core classes
    "Extent",
    "ExtendMode",
    "Snippet",
    "ProcessingElement",
    "SourcePE",
    "Renderer",
    "ProfileReport",
    "PEProfile",
    "NullRenderer",
    "GateSignal",
    "TriggerSignal",
    "AudioRenderer",
    # Processing elements
    "AdsrGatedPE",
    "AdsrTriggeredPE",
    "AnalogOscPE",
    "ArrayPE",
    "BlitSawPE",
    "SuperSawPE",
    "PortamentoPE",
    "AudioReaderPE",
    "BiquadPE",
    "SVFilterPE",
    "CachePE",
    "CompressorPE",
    "ConstantPE",
    "ControlPE",
    "ParamPE",
    "ConvolvePE",
    "DynamicsPE",
    "ExpanderPE",
    "LimiterPE",
    "ReverbPE",
    "EnvelopePE",
    "FunctionGenPE",
    "PeriodicGate",
    "PeriodicTrigger",
    "SampleHoldPE",
    "SlewLimiterPE",
    "TrackHoldPE",
    "CropPE",
    "DelayPE",
    "DiracPE",
    "GainPE",
    "IdentityPE",
    "KarplusStrongPE",
    "rho_for_decay_db",
    "LadderPE",
    "CombPE",
    "LoopPE",
    "MeltysynthPE",
    "MidiInPE",
    "MixPE",
    "RandomSelectPE",
    "ResetPE",
    "TriggerMode",
    "TriggerPE",
    "ReversePitchEchoPE",
    "SpatialPE",
    "SpatialMethod",
    "SpatialAdapter",
    "SpatialLinear",
    "SpatialConstantPower",
    "SpatialHRTF",
    "TimeWarpPE",
    "TralfamPE",
    "TriggerRestartPE",
    "WavetablePE",
    "WindowPE",
    "NoisePE",
    "RandomPE",
    "PiecewisePE",
    "SequencePE",
    "SlicePE",
    "SetExtentPE",
    "SinePE",
    "TransformPE",
    "WavReaderPE",
    "WavWriterPE",
    # Enums
    "BiquadMode",
    "DetectionMode",
    "DynamicsMode",
    "InterpolationMode",
    "LadderMode",
    "NoiseMode",
    "RandomMode",
    "OutOfBoundsMode",
    "SequenceMode",
    "SlewMode",
    "TransitionType",
    "WindowMode",
    # Conversions
    "pitch_to_freq",
    "freq_to_pitch",
    "ratio_to_db",
    "db_to_ratio",
    "semitones_to_ratio",
    "ratio_to_semitones",
    "samples_to_seconds",
    "seconds_to_samples",
    # Temperament
    "Temperament",
    "EqualTemperament",
    "JustIntonation",
    "PythagoreanTuning",
    "CustomTemperament",
    "set_temperament",
    "get_temperament",
    "set_reference_frequency",
    "get_reference_frequency",
    "set_concert_pitch",
    "set_verdi_tuning",
    "set_baroque_pitch",
    # Assets
    "AssetLoader",
    "AssetManager",
    "AudioLibrary",
    "GoogleDriveAssetLoader",
    "GithubUserContentAssetLoader",
    # Debug
    "print_pe_tree",
    # Playback utilities
    "browse",
    "play",
    "play_offline",
    "render_to_array",
    "render_to_file",
    # Logging
    "set_global_logging",
    "get_logger",
    "__version__",
]
