"""Egress: sinks, wire codec (reference parity), event hooks."""

from .events import Event, EventDispatcher, EventKind
from .websocket import ConnectionState, WebSocketClient, WebSocketConfig, WsMessage
from .sinks import ArraySink, CallbackSink, JsonlSink, NpySink, Sink, WavSink, WireJsonlSink, auto_sink
from .wire import (
    configure_message,
    decode_audio_chunk,
    encode_audio_chunk,
    i16_bytes_to_f32,
    pcm_f32_to_i16_bytes,
    strip_markers,
)

__all__ = [
    "ArraySink",
    "CallbackSink",
    "ConnectionState",
    "WebSocketClient",
    "WebSocketConfig",
    "WsMessage",
    "Event",
    "EventDispatcher",
    "EventKind",
    "JsonlSink",
    "NpySink",
    "Sink",
    "WavSink",
    "WireJsonlSink",
    "auto_sink",
    "configure_message",
    "decode_audio_chunk",
    "encode_audio_chunk",
    "i16_bytes_to_f32",
    "pcm_f32_to_i16_bytes",
    "strip_markers",
]
