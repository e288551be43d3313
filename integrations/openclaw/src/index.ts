export {
  FunasrTpuRealtimeTranscriptionProvider,
  type FunasrTpuProviderOptions,
  type TranscriptEvent,
} from "./realtime-transcription-provider";
export {
  decodeUlaw,
  ulawToPcm16,
  upsample8kTo16k,
  FrameAccumulator,
} from "./audio";
