// Dashboard: three.js trajectory + recharts metric charts over useSlamData.
"use client";
import React from "react";
import {
  LineChart, Line, XAxis, YAxis, Tooltip, ResponsiveContainer,
} from "recharts";
import { useSlamData } from "../hooks/useSlamData";
import TrajectoryScene from "./TrajectoryScene";

export default function Dashboard() {
  const { connected, latest, history } = useSlamData();
  const metricData = history.map((f) => ({
    frame: f.frame_id,
    matches: f.num_matches,
    inliers: f.num_inliers,
    ratio: f.inlier_ratio,
  }));
  return (
    <div style={{ display: "grid", gridTemplateColumns: "2fr 1fr", gap: 16, padding: 16 }}>
      <section>
        <h2>Trajectory {connected ? "· live" : "· disconnected"}</h2>
        <TrajectoryScene
          trajectory={latest?.trajectory ?? []}
          optimized={latest?.optimized_trajectory ?? []}
          edges={latest?.graph_edges ?? []}
        />
      </section>
      <section>
        <h2>Matching</h2>
        <ResponsiveContainer width="100%" height={200}>
          <LineChart data={metricData}>
            <XAxis dataKey="frame" />
            <YAxis />
            <Tooltip />
            <Line type="monotone" dataKey="matches" dot={false} stroke="#4ea1ff" />
            <Line type="monotone" dataKey="inliers" dot={false} stroke="#63d88a" />
          </LineChart>
        </ResponsiveContainer>
        <h2>Inlier ratio</h2>
        <ResponsiveContainer width="100%" height={160}>
          <LineChart data={metricData}>
            <XAxis dataKey="frame" />
            <YAxis domain={[0, 1]} />
            <Tooltip />
            <Line type="monotone" dataKey="ratio" dot={false} stroke="#ffb65e" />
          </LineChart>
        </ResponsiveContainer>
        <dl>
          <dt>Frame</dt><dd>{latest?.frame_id ?? "–"}</dd>
          <dt>Model</dt><dd>{latest?.model_type ?? "–"}</dd>
          <dt>Tracking</dt><dd>{latest ? (latest.pose_success ? "OK" : "LOST") : "–"}</dd>
          <dt>Progress</dt><dd>{latest ? `${Math.round(latest.progress * 100)}%` : "–"}</dd>
        </dl>
      </section>
    </div>
  );
}
