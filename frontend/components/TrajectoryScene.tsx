// three.js (react-three-fiber) 3D trajectory rendering.
"use client";
import React, { useMemo } from "react";
import { Canvas } from "@react-three/fiber";
import * as THREE from "three";

interface Props {
  trajectory: [number, number][];
  optimized: [number, number][];
  edges: [number, number][];
}

function Polyline({ points, color }: { points: [number, number][]; color: string }) {
  const geometry = useMemo(() => {
    const g = new THREE.BufferGeometry();
    g.setFromPoints(points.map(([x, z]) => new THREE.Vector3(x, 0, z)));
    return g;
  }, [points]);
  return (
    <line>
      <primitive object={geometry} attach="geometry" />
      <lineBasicMaterial color={color} />
    </line>
  );
}

export default function TrajectoryScene({ trajectory, optimized, edges }: Props) {
  return (
    <Canvas style={{ height: 480, background: "#0e1013" }} camera={{ position: [0, 40, 40] }}>
      <ambientLight intensity={0.8} />
      <gridHelper args={[100, 20, "#2a2e35", "#1d2026"]} />
      {trajectory.length > 1 && <Polyline points={trajectory} color="#4ea1ff" />}
      {optimized.length > 1 && <Polyline points={optimized} color="#ff5e5e" />}
      {edges.map(([i, j], k) =>
        trajectory[i] && trajectory[j] ? (
          <Polyline key={k} points={[trajectory[i], trajectory[j]]} color="#63d88a" />
        ) : null
      )}
    </Canvas>
  );
}
