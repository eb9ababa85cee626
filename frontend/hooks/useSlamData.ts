// Live SLAM telemetry hook. Consumes the richer message schema produced by
// mvslam_tpu.viz.dashboard_server (pose_matrix, trajectories, metrics) —
// the schema the reference's frontend expected but its backend never sent.
import { useEffect, useRef, useState } from "react";

export interface SlamFrame {
  frame_id: number;
  timestamp: number;
  num_features: number;
  num_matches: number;
  num_inliers: number;
  inlier_ratio: number;
  pose_success: boolean;
  model_type: string;
  pose_matrix: number[][];
  position: [number, number, number];
  trajectory: [number, number][];
  optimized_trajectory: [number, number][];
  graph_edges: [number, number][];
  progress: number;
}

export interface SlamData {
  connected: boolean;
  latest: SlamFrame | null;
  history: SlamFrame[];
}

export function useSlamData(url = `ws://${typeof window !== "undefined" ? window.location.hostname : "localhost"}:8000`): SlamData {
  const [connected, setConnected] = useState(false);
  const [latest, setLatest] = useState<SlamFrame | null>(null);
  const historyRef = useRef<SlamFrame[]>([]);

  useEffect(() => {
    let ws: WebSocket | null = null;
    let closed = false;
    const connect = () => {
      ws = new WebSocket(url);
      ws.onopen = () => setConnected(true);
      ws.onclose = () => {
        setConnected(false);
        if (!closed) setTimeout(connect, 1000);
      };
      ws.onmessage = (event) => {
        const frame: SlamFrame = JSON.parse(event.data);
        historyRef.current = [...historyRef.current.slice(-499), frame];
        setLatest(frame);
      };
    };
    connect();
    return () => {
      closed = true;
      ws?.close();
    };
  }, [url]);

  return { connected, latest, history: historyRef.current };
}
